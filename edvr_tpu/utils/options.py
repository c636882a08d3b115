"""YAML option parsing with the reference toolbox's key semantics.

The YAML files themselves are interchangeable with the reference's
(reference: basicsr/utils/options.py:31-89). ``parse`` adds the same
derived keys: ``is_train``, per-dataset ``phase``/``scale``, ``~``
expansion for data and checkpoint paths, the
``experiments/<name>/{models,training_states,visualization}`` (train)
or ``results/<name>/visualization`` (test) directory layout, and the
debug-mode frequency shortcuts triggered by 'debug' in the experiment
name. Plain dicts are insertion-ordered in py3.7+, so no OrderedDict
machinery is needed.
"""

from __future__ import annotations

import os.path as osp

import yaml


def yaml_load(s: str):
    """Load YAML from a string or a path to a file."""
    if s.endswith(('.yml', '.yaml')):
        with open(s, 'r') as f:
            return yaml.load(f, Loader=yaml.SafeLoader)
    return yaml.load(s, Loader=yaml.SafeLoader)


def _prepare_datasets(opt):
    """Inject phase/scale into each dataset block; expand dataroots."""
    scale = opt.get('scale')
    for phase_key, ds in opt.get('datasets', {}).items():
        # 'test_1', 'test_2', ... are all 'test' phases
        ds['phase'] = phase_key.split('_')[0]
        if scale is not None:
            ds['scale'] = scale
        for root_key in ('dataroot_gt', 'dataroot_lq'):
            if ds.get(root_key) is not None:
                ds[root_key] = osp.expanduser(ds[root_key])


def _layout_dirs(opt, is_train):
    """Compute the run's output directory tree under path.root."""
    paths = opt['path']
    if is_train:
        exp = osp.join(paths['root'], 'experiments', opt['name'])
        paths.update(
            experiments_root=exp,
            models=osp.join(exp, 'models'),
            training_states=osp.join(exp, 'training_states'),
            log=exp,
            visualization=osp.join(exp, 'visualization'))
    else:
        res = osp.join(paths['root'], 'results', opt['name'])
        paths.update(results_root=res, log=res,
                     visualization=osp.join(res, 'visualization'))


def _debug_shortcuts(opt):
    """'debug' experiments validate/log/checkpoint near-constantly."""
    if 'val' in opt:
        opt['val']['val_freq'] = 8
    opt['logger']['print_freq'] = 1
    opt['logger']['save_checkpoint_freq'] = 8


def parse(opt_path: str, is_train: bool = True, root: str | None = None):
    """Parse an option file.

    Args:
        opt_path: Path to the YAML option file.
        is_train: Training or testing mode.
        root: Root path under which ``experiments/`` / ``results/`` live.
            Defaults to the current working directory (the reference uses
            its repo root, basicsr/utils/options.py:64-65).

    Returns:
        dict: parsed options.
    """
    opt = yaml_load(opt_path)
    opt['is_train'] = is_train
    _prepare_datasets(opt)

    paths = opt.setdefault('path', {})
    for key, val in paths.items():
        if val is not None and ('resume_state' in key
                                or 'pretrain_network' in key):
            paths[key] = osp.expanduser(val)
    paths['root'] = osp.abspath(root) if root else osp.abspath('.')

    _layout_dirs(opt, is_train)
    if is_train and 'debug' in opt['name']:
        _debug_shortcuts(opt)
    return opt


def dict2str(opt, indent_level: int = 1) -> str:
    """Format a nested option dict for logging (reference layout:
    ``key:[`` ... ``]`` blocks, two spaces per level)."""
    pad = ' ' * (indent_level * 2)
    lines = ['']
    for k, v in opt.items():
        if isinstance(v, dict):
            lines.append(f'{pad}{k}:[{dict2str(v, indent_level + 1)}{pad}]')
        else:
            lines.append(f'{pad}{k}: {v}')
    return '\n'.join(lines) + '\n'
