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
        if f'block_{token}' in children:
            yield f'block_{token}', 1
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


_PARAM_NAME_MAP = {'weight': 'kernel', 'bias': 'bias'}


def convert_state_dict(state: dict, params_template) -> tuple[dict, list]:
    """Map a flat torch state_dict onto a flax params tree.

    Args:
        state: {torch_name: np.ndarray}.
        params_template: the flax params dict (e.g. from model.init) that
            defines the target structure and shapes.

    Returns:
        (new params tree, list of unmatched torch keys)
    """
    import jax
    flat_template = _flatten(params_template)
    new_flat = dict(flat_template)
    unmatched = []
    used = set()
    for key, val in state.items():
        tokens = key.split('.')
        pname = tokens[-1]
        val = np.asarray(val)
        target = _PARAM_NAME_MAP.get(pname, pname)
        # candidate param paths: mapped name, raw name (e.g. DCNv2Pack's
        # direct 'weight' param), then inside the Conv2d wrapper's inner
        # 'conv' scope
        path = None
        for tail in ([target], [pname], ['conv', target], ['conv', pname]):
            path = _resolve_path(tokens[:-1] + tail, params_template)
            if path is not None:
                break
        if path is None:
            unmatched.append(key)
            continue
        tpath = tuple(path)
        tshape = flat_template[tpath].shape
        if val.ndim == 4:  # conv OIHW -> HWIO
            val = val.transpose(2, 3, 1, 0)
        elif val.ndim == 2 and target == 'kernel':  # linear (o,i) -> (i,o)
            val = val.transpose(1, 0)
        if val.shape != tshape:
            raise ValueError(
                f'{key}: shape {val.shape} does not match template '
                f'{tshape} at {tpath}')
        new_flat[tpath] = val.astype(flat_template[tpath].dtype)
        used.add(tpath)
    return _unflatten(new_flat), unmatched


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
