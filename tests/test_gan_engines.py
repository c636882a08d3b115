"""GAN engine smoke tests: SRGAN/ESRGAN alternating updates and the
StyleGAN2 engine with lazy R1/path regularization and EMA, on the
8-device CPU mesh."""

import numpy as np
import pytest

import jax.numpy as jnp


def _gan_opt(tmp_path, model_type):
    return {
        'name': 'gan_smoke', 'model_type': model_type, 'scale': 4,
        'num_gpu': 8, 'manual_seed': 0, 'is_train': True, 'dist': False,
        'network_g': dict(type='MSRResNet', num_in_ch=3, num_out_ch=3,
                          num_feat=8, num_block=1, upscale=4),
        'network_d': dict(type='VGGStyleDiscriminator128', num_in_ch=3,
                          num_feat=4),
        'path': {},
        'train': {
            'optim_g': dict(type='Adam', lr=1e-4, betas=[0.9, 0.99]),
            'optim_d': dict(type='Adam', lr=1e-4, betas=[0.9, 0.99]),
            'scheduler': dict(type='MultiStepRestartLR',
                              milestones=[100], gamma=0.5),
            'total_iter': 4, 'warmup_iter': -1,
            'pixel_opt': dict(type='L1Loss', loss_weight=1e-2,
                              reduction='mean'),
            'gan_opt': dict(type='GANLoss', gan_type='vanilla',
                            real_label_val=1.0, fake_label_val=0.0,
                            loss_weight=5e-3),
            'net_d_iters': 1, 'net_d_init_iters': 0,
        },
        'logger': {'print_freq': 1, 'save_checkpoint_freq': 100},
    }


@pytest.mark.slow
@pytest.mark.parametrize('model_type', ['SRGANModel', 'ESRGANModel'])
def test_srgan_esrgan_step(tmp_path, model_type):
    from edvr_tpu.models import create_model
    model = create_model(_gan_opt(tmp_path, model_type))
    rng = np.random.RandomState(0)
    batch = {
        'lq': rng.rand(8, 32, 32, 3).astype(np.float32),
        'gt': rng.rand(8, 128, 128, 3).astype(np.float32),
    }
    model.feed_data(batch)
    for it in (1, 2):
        model.optimize_parameters(it)
    log = model.get_current_log()
    for k in ('l_g_pix', 'l_g_gan', 'l_d_real', 'l_d_fake'):
        assert np.isfinite(log[k]), (k, log)


@pytest.mark.slow
def test_srgan_save_resume_equals_uninterrupted(tmp_path):
    """4 straight iters == 2 iters -> save -> resume -> 2 iters, for
    params_g, params_d, D's BN running stats, and (implicitly, through
    the continued trajectory) both Adam states."""
    import jax

    from edvr_tpu.models import create_model
    from edvr_tpu.models.base_model import load_resume_state
    from edvr_tpu.utils import check_resume

    rng = np.random.RandomState(0)
    batches = [{
        'lq': rng.rand(8, 32, 32, 3).astype(np.float32),
        'gt': rng.rand(8, 128, 128, 3).astype(np.float32),
    } for _ in range(4)]

    def run(model, iters, batch_iter):
        for it in iters:
            model.feed_data(batches[batch_iter(it)])
            model.optimize_parameters(it)

    def paths(sub):
        return {'models': str(tmp_path / sub / 'models'),
                'training_states': str(tmp_path / sub / 'states')}

    # uninterrupted
    opt = _gan_opt(tmp_path, 'SRGANModel')
    opt['path'] = paths('a')
    ref = create_model(opt)
    run(ref, range(1, 5), lambda it: it - 1)

    # interrupted at 2
    opt = _gan_opt(tmp_path, 'SRGANModel')
    opt['path'] = paths('b')
    m1 = create_model(opt)
    run(m1, range(1, 3), lambda it: it - 1)
    m1.save(epoch=0, current_iter=2)

    opt = _gan_opt(tmp_path, 'SRGANModel')
    opt['path'] = paths('b')
    opt['path']['resume_state'] = str(tmp_path / 'b' / 'states' / '2.state')
    state = load_resume_state(opt)
    check_resume(opt, state['iter'])
    m2 = create_model(opt)
    m2.resume_training(state)
    run(m2, range(3, 5), lambda it: it - 1)

    for name, a, b in [('params_g', ref.params_g, m2.params_g),
                       ('params_d', ref.params_d, m2.params_d),
                       ('bstats_d', ref.bstats_d, m2.bstats_d)]:
        la = jax.tree_util.tree_leaves(a)
        lb = jax.tree_util.tree_leaves(b)
        assert la, name
        for x, y in zip(la, lb):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-6, atol=1e-7, err_msg=name)


@pytest.mark.slow
def test_stylegan2_step(tmp_path):
    from edvr_tpu.models import create_model
    opt = {
        'name': 'sg2_smoke', 'model_type': 'StyleGAN2Model',
        'num_gpu': 8, 'manual_seed': 0, 'is_train': True, 'dist': False,
        'network_g': dict(type='StyleGAN2Generator', out_size=32,
                          num_style_feat=16, num_mlp=2,
                          channel_multiplier=1, narrow=0.125),
        'network_d': dict(type='StyleGAN2Discriminator', out_size=32,
                          channel_multiplier=1, narrow=0.125,
                          stddev_group=4),
        'path': {'visualization': str(tmp_path / 'vis')},
        'train': {
            'optim_g': dict(type='Adam', lr=2e-3),
            'optim_d': dict(type='Adam', lr=2e-3),
            'scheduler': dict(type='ConstantLR'),
            'total_iter': 4, 'warmup_iter': -1,
            'gan_opt': dict(type='GANLoss', gan_type='wgan_softplus',
                            loss_weight=1),
            'r1_reg_weight': 10, 'path_reg_weight': 2,
            'net_g_reg_every': 3, 'net_d_reg_every': 2,
            'mixing_prob': 0.9, 'path_batch_shrink': 2,
        },
        'val': {'num_val_samples': 4},
        'logger': {},
    }
    from edvr_tpu.models import create_model
    model = create_model(opt)
    rng = np.random.RandomState(0)
    model.feed_data({'gt': rng.rand(8, 32, 32, 3).astype(np.float32) * 2
                     - 1})
    # iters chosen to hit both reg branches (d at 2, g at 3)
    for it in (1, 2, 3):
        model.optimize_parameters(it)
    log = model.get_current_log()
    assert np.isfinite(log['l_g']) and np.isfinite(log['l_d'])
    assert 'l_g_path' in log  # iter 3 hit the path-regularization branch
    # ema params differ from raw g params after updates
    import jax
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), model.params_g,
        model.params_g_ema)
    assert max(jax.tree_util.tree_leaves(diff)) > 0
    # fixed-sample validation writes an image grid
    model.opt['is_train'] = True
    model.nondist_validation(None, 3, None, save_img=True)
    assert any((tmp_path / 'vis').rglob('*.png'))
