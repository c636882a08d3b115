import os.path as osp

from edvr_tpu.utils.options import dict2str, parse

SAMPLE = """
name: debug_test_exp
model_type: SRModel
scale: 4
num_gpu: 1
manual_seed: 0

datasets:
  train:
    name: DIV2K
    type: PairedImageDataset
    dataroot_gt: ~/datasets/gt
    dataroot_lq: ~/datasets/lq
  val_1:
    name: Set5
    type: PairedImageDataset
    dataroot_gt: data/set5/gt
    dataroot_lq: data/set5/lq

path:
  pretrain_network_g: ~/ckpt/net_g.ckpt
  strict_load_g: true
  resume_state: ~

train:
  total_iter: 1000

val:
  val_freq: 5000

logger:
  print_freq: 100
  save_checkpoint_freq: 5000
"""


def _write(tmp_path):
    p = tmp_path / 'opt.yml'
    p.write_text(SAMPLE)
    return str(p)


def test_parse_train(tmp_path):
    opt = parse(_write(tmp_path), is_train=True, root=str(tmp_path))
    assert opt['is_train'] is True
    # phase propagation: val_1 -> val
    assert opt['datasets']['train']['phase'] == 'train'
    assert opt['datasets']['val_1']['phase'] == 'val'
    # scale propagation
    assert opt['datasets']['train']['scale'] == 4
    assert opt['datasets']['val_1']['scale'] == 4
    # ~ expansion
    assert not opt['datasets']['train']['dataroot_gt'].startswith('~')
    assert not opt['path']['pretrain_network_g'].startswith('~')
    # experiment dir layout
    er = opt['path']['experiments_root']
    assert er == osp.join(str(tmp_path), 'experiments', 'debug_test_exp')
    assert opt['path']['models'] == osp.join(er, 'models')
    assert opt['path']['training_states'] == osp.join(er, 'training_states')
    assert opt['path']['log'] == er
    # debug-mode overrides ('debug' in name)
    assert opt['val']['val_freq'] == 8
    assert opt['logger']['print_freq'] == 1
    assert opt['logger']['save_checkpoint_freq'] == 8


def test_parse_test(tmp_path):
    opt = parse(_write(tmp_path), is_train=False, root=str(tmp_path))
    rr = opt['path']['results_root']
    assert rr == osp.join(str(tmp_path), 'results', 'debug_test_exp')
    assert opt['path']['log'] == rr
    assert 'experiments_root' not in opt['path']


def test_dict2str():
    s = dict2str({'a': 1, 'b': {'c': 'x'}})
    assert 'a: 1' in s and 'b:[' in s and 'c: x' in s


def test_registry():
    import pytest
    from edvr_tpu.utils.registry import Registry
    reg = Registry('toy')

    @reg.register()
    class Foo:
        pass

    reg.register(name='Bar', obj=Foo)
    assert reg.get('Foo') is Foo
    assert reg.get('Bar') is Foo
    assert 'Foo' in reg
    with pytest.raises(KeyError):
        reg.get('Missing')
    with pytest.raises(KeyError):
        reg.register(Foo)  # duplicate
