"""Import reference (PyTorch BasicSR) checkpoints into flax param trees.

Replaces the reference's model-conversion tooling
(reference: scripts/model_conversion/convert_models.py) for the
reverse direction: the reference saves ``{'params': state_dict}`` .pth
files (base_model.py:170-201); this module maps those flat
``a.b.0.weight`` keys onto this framework's nested NHWC flax params.

Key translation is a greedy walk of the *actual* flax tree, so each
arch's naming conventions (Sequential ``block_{i}``, ModuleDict
``name_l{n}`` merges, EDSR's ``up_{i//2}`` upsample indices, the Conv2d
wrapper's inner ``conv`` scope) resolve without per-arch tables.
Tensors are transposed torch->flax: conv OIHW -> HWIO, linear
(out, in) -> (in, out).
"""

from __future__ import annotations

import numpy as np


def load_torch_weights(path: str, param_key: str = 'params') -> dict:
    """Load a reference .pth checkpoint into {name: np.ndarray}.

    Accepts raw state_dicts or {'params': ...}/{'params_ema': ...}
    wrappers (reference: base_model.py:238-262). Strips 'module.'
    prefixes like the reference loader.
    """
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=True)
    if param_key is not None and param_key in ckpt:
        ckpt = ckpt[param_key]
    out = {}
    for k, v in ckpt.items():
        if k.startswith('module.'):
            k = k[7:]
        out[k] = v.detach().cpu().numpy()
    return out


def _child_candidates(token: str, nxt: str | None, children):
    """Yield candidate (child_name, tokens_consumed) for a torch token."""
    if nxt is not None and f'{token}_{nxt}' in children:
        yield f'{token}_{nxt}', 2
    if token in children:
        yield token, 1
    if token.isdigit():
        if nxt is not None and f'seq_{token}_{nxt}' in children:
            # e.g. a FusedLeakyReLU bias at Sequential index N ->
            # 'seq_N_bias'
            yield f'seq_{token}_{nxt}', 2
        if f'block_{token}' in children:
            yield f'block_{token}', 1
        if f'seq_{token}' in children:
            yield f'seq_{token}', 1
        if f'up_{int(token) // 2}' in children:
            yield f'up_{int(token) // 2}', 1


def _resolve_path(tokens, tree):
    """Greedily resolve torch name tokens (sans the final param name)
    against the nested flax dict; returns the path list or None."""
    node = tree
    path = []
    i = 0
    while i < len(tokens):
        if not isinstance(node, dict):
            return None
        nxt = tokens[i + 1] if i + 1 < len(tokens) else None
        for cand, consumed in _child_candidates(tokens[i], nxt, node):
            sub = _resolve_path(tokens[i + consumed:], node[cand])
            if sub is not None:
                return path + [cand] + sub
        return None
    return path


def convert_state_dict(state: dict, variables_template) -> tuple[dict, list]:
    """Map a flat torch state_dict onto a flax variable tree.

    Args:
        state: {torch_name: np.ndarray}.
        variables_template: either a flax params dict, or a full
            variables dict with 'params' (and optionally 'batch_stats'
            for networks with BatchNorm) that defines the target
            structure and shapes.

    Returns:
        (new variable tree with the same top-level structure,
         list of unmatched torch keys)
    """
    full = isinstance(variables_template, dict) and (
        'params' in variables_template)
    params_template = variables_template['params'] if full else \
        variables_template
    stats_template = variables_template.get('batch_stats') if full else None

    flat_params = _flatten(params_template)
    flat_stats = _flatten(stats_template) if stats_template else {}
    new_params = dict(flat_params)
    new_stats = dict(flat_stats)
    extra = {}  # other collections (e.g. 'noises')
    unmatched = []
    for key, val in state.items():
        tokens = key.split('.')
        pname = tokens[-1]
        val = np.asarray(val)
        if pname == 'num_batches_tracked':
            continue
        if pname in ('running_mean', 'running_var'):
            # BatchNorm statistics live in the batch_stats collection
            target = 'mean' if pname == 'running_mean' else 'var'
            path = _resolve_path(tokens[:-1] + [target], stats_template or {})
            if path is None:
                unmatched.append(key)
                continue
            tpath = tuple(path)
            if val.shape != flat_stats[tpath].shape:
                raise ValueError(f'{key}: shape {val.shape} != '
                                 f'{flat_stats[tpath].shape} at {tpath}')
            new_stats[tpath] = val.astype(flat_stats[tpath].dtype)
            continue
        # candidate param names: conv kernel, raw (DCNv2Pack's direct
        # 'weight'), BatchNorm scale, then inside the Conv2d wrapper's
        # inner 'conv' scope
        cands = []
        if pname == 'weight':
            cands = (['kernel'], ['weight'], ['scale'], ['conv', 'kernel'])
        else:
            cands = ([pname], ['conv', pname])
        path = None
        for tail in cands:
            path = _resolve_path(tokens[:-1] + list(tail), params_template)
            if path is not None:
                break
        target_flat, target_new = flat_params, new_params
        if path is None and full:
            # extra collections (e.g. 'noises' buffers)
            for cname, ctmpl in variables_template.items():
                if cname in ('params', 'batch_stats') or ctmpl is None:
                    continue
                path = _resolve_path(tokens, ctmpl)
                if path is None and tokens[0] == cname:
                    # torch names the buffer holder like the collection
                    # (e.g. 'noises.noise0')
                    path = _resolve_path(tokens[1:], ctmpl)
                if path is not None:
                    extra.setdefault(cname, dict(_flatten(ctmpl)))
                    target_flat = _flatten(ctmpl)
                    target_new = extra[cname]
                    break
        if path is None:
            unmatched.append(key)
            continue
        tpath = tuple(path)
        tshape = target_flat[tpath].shape
        val = _match_layout(val, tshape, path[-1])
        if val is None:
            raise ValueError(
                f'{key}: no layout of shape {np.asarray(state[key]).shape} '
                f'matches template {tshape} at {tpath}')
        target_new[tpath] = val.astype(target_flat[tpath].dtype)
    out_params = _unflatten(new_params)
    if full:
        out = dict(variables_template)
        out['params'] = out_params
        if stats_template is not None:
            out['batch_stats'] = _unflatten(new_stats)
        for cname, cflat in extra.items():
            out[cname] = _unflatten(cflat)
        return out, unmatched
    return out_params, unmatched


def _match_layout(val: np.ndarray, tshape, leaf_name: str):
    """Find the torch->flax layout transform matching the template shape.

    Order of preference: conv OIHW->HWIO (4D) / conv3d OIDHW->DHWIO
    (5D) / linear (o,i)->(i,o) (2D), then NCHW->NHWC (buffers like
    StyleGAN2's constant input and noises), then identity (e.g. the
    (1, cout, cin, k, k) modulated-conv weight kept in torch layout),
    then squeeze (e.g. a (1, c, 1, 1) bias onto (c,)).
    """
    candidates = []
    if val.ndim == 4:
        candidates.append(val.transpose(2, 3, 1, 0))
        candidates.append(val.transpose(0, 2, 3, 1))
    elif val.ndim == 5:
        candidates.append(val.transpose(2, 3, 4, 1, 0))
    elif val.ndim == 2 and leaf_name in ('kernel', 'weight'):
        candidates.append(val.transpose(1, 0))
    candidates.append(val)
    squeezed = val.reshape([s for s in val.shape if s != 1] or [1])
    candidates.append(squeezed)
    for cand in candidates:
        if cand.shape == tuple(tshape):
            return np.ascontiguousarray(cand)
    return None


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def _unflatten(flat):
    tree = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def fold_spectral_norm(state: dict) -> dict:
    """Fold torch spectral_norm parametrizations into plain weights.

    torch checkpoints of spectral-normalized modules store
    ``weight_orig``, ``weight_u`` and ``weight_v``; the effective weight
    is ``W / sigma`` with ``sigma = u^T @ W_mat @ v`` (W_mat = W
    reshaped to (out, -1)). Used for inference-only imports (DFDNet).
    """
    out = {}
    for key, val in state.items():
        if key.endswith('weight_orig'):
            base = key[:-len('weight_orig')]  # keeps the trailing dot
            w = np.asarray(val)
            u = np.asarray(state[f'{base}weight_u'])
            v = np.asarray(state[f'{base}weight_v'])
            w_mat = w.reshape(w.shape[0], -1)
            sigma = u @ (w_mat @ v)
            out[f'{base}weight'] = w / sigma
        elif key.endswith(('weight_u', 'weight_v')):
            continue
        else:
            out[key] = val
    return out
