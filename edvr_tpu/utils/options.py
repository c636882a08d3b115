"""YAML option parsing with the reference toolbox's key semantics.

Mirrors the behavior of the reference parser
(reference: basicsr/utils/options.py:31-89): ``is_train`` injection,
per-dataset ``phase``/``scale`` propagation, ``~`` expansion for data and
checkpoint paths, experiment/results directory layout, and debug-mode
frequency overrides. Plain dicts are insertion-ordered in py3.7+, so no
OrderedDict machinery is needed.
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

    # datasets: propagate phase and scale, expand user in dataroots
    # (reference: basicsr/utils/options.py:48-57)
    for phase, dataset in opt.get('datasets', {}).items():
        phase = phase.split('_')[0]  # e.g. test_1, test_2 -> test
        dataset['phase'] = phase
        if 'scale' in opt:
            dataset['scale'] = opt['scale']
        for key in ('dataroot_gt', 'dataroot_lq'):
            if dataset.get(key) is not None:
                dataset[key] = osp.expanduser(dataset[key])

    # paths (reference: basicsr/utils/options.py:60-65)
    opt.setdefault('path', {})
    for key, val in opt['path'].items():
        if (val is not None) and ('resume_state' in key
                                  or 'pretrain_network' in key):
            opt['path'][key] = osp.expanduser(val)
    opt['path']['root'] = osp.abspath(root) if root else osp.abspath('.')

    if is_train:
        experiments_root = osp.join(opt['path']['root'], 'experiments',
                                    opt['name'])
        opt['path']['experiments_root'] = experiments_root
        opt['path']['models'] = osp.join(experiments_root, 'models')
        opt['path']['training_states'] = osp.join(experiments_root,
                                                  'training_states')
        opt['path']['log'] = experiments_root
        opt['path']['visualization'] = osp.join(experiments_root,
                                                'visualization')
        # debug mode shortcuts (reference: basicsr/utils/options.py:78-82)
        if 'debug' in opt['name']:
            if 'val' in opt:
                opt['val']['val_freq'] = 8
            opt['logger']['print_freq'] = 1
            opt['logger']['save_checkpoint_freq'] = 8
    else:
        results_root = osp.join(opt['path']['root'], 'results', opt['name'])
        opt['path']['results_root'] = results_root
        opt['path']['log'] = results_root
        opt['path']['visualization'] = osp.join(results_root, 'visualization')

    return opt


def dict2str(opt, indent_level: int = 1) -> str:
    """Format a nested option dict for logging
    (reference: basicsr/utils/options.py:92-110)."""
    msg = '\n'
    for k, v in opt.items():
        if isinstance(v, dict):
            msg += ' ' * (indent_level * 2) + k + ':['
            msg += dict2str(v, indent_level + 1)
            msg += ' ' * (indent_level * 2) + ']\n'
        else:
            msg += ' ' * (indent_level * 2) + k + ': ' + str(v) + '\n'
    return msg
