"""StyleGAN2 training engine (reference: basicsr/models/stylegan2_model.py).

JAX formulation: three jitted steps — the D step (logistic loss), the
lazy R1 regularization step (second-order autodiff replaces
autograd.grad, no DDP `0 * pred` hacks needed), and the G step with
optional path-length regularization (vjp against pre-scaled noise) —
plus a compiled EMA update. Style mixing keeps one trace by building
the latent with an arange < inject_index mask instead of Python-level
list shapes. Optimizers carry the lazy-regularization-adjusted lr and
betas (stylegan2_model.py:96-185).
"""

from __future__ import annotations

import random
from copy import deepcopy
from os import path as osp

import jax
import jax.numpy as jnp
import numpy as np
import optax

import cv2

from edvr_tpu.archs import define_network
from edvr_tpu.models.base_model import BaseModel
from edvr_tpu.models.losses import build_loss, g_path_regularize, r1_penalty
from edvr_tpu.utils import imwrite, tensor2img
from edvr_tpu.utils.registry import MODEL_REGISTRY


@MODEL_REGISTRY.register()
class StyleGAN2Model(BaseModel):

    def __init__(self, opt):
        super().__init__(opt)
        self.net_g = define_network(deepcopy(opt['network_g']))
        seed = opt.get('manual_seed') or 0
        self._rng = np.random.RandomState(seed + 7)
        self._noise_key = jax.random.PRNGKey(seed + 11)

        self.num_style_feat = opt['network_g']['num_style_feat']
        variables = self.net_g.init(
            {'params': jax.random.PRNGKey(seed)},
            [jnp.zeros((1, self.num_style_feat))], randomize_noise=False)
        self.params_g = self.replicate(variables['params'])
        self.noises_g = self.replicate(variables.get('noises', {}))
        self.print_network(self.net_g, self.params_g)

        load_path = self.opt['path'].get('pretrain_network_g')
        if load_path is not None:
            self.params_g = self.replicate(self.load_network(
                load_path, self.opt['path'].get('strict_load_g', True),
                param_key=self.opt['path'].get('param_key_g', 'params'),
                params_template=self.params_g))

        num_val_samples = self.opt.get('val', {}).get('num_val_samples', 16)
        self.fixed_sample = jnp.asarray(
            self._rng.randn(num_val_samples,
                            self.num_style_feat).astype(np.float32))

        if self.is_train:
            self.init_training_settings()

    # ------------------------------------------------------------------ #
    def init_training_settings(self):
        opt = self.opt
        train_opt = opt['train']
        if train_opt.get('mixed_precision'):
            # this engine builds its own G/D/reg steps; fail loudly
            # rather than silently training in f32 under an mp config
            raise NotImplementedError(
                'mixed_precision is only supported by the SRModel-step '
                'family (SRModel/VideoBaseModel/EDVRModel).')

        self.net_d = define_network(deepcopy(opt['network_d']))
        seed = (opt.get('manual_seed') or 0) + 1
        size = opt['network_d']['out_size']
        vd = self.net_d.init(jax.random.PRNGKey(seed),
                             jnp.zeros((4, size, size, 3)))
        self.params_d = self.replicate(vd['params'])
        self.print_network(self.net_d, self.params_d)
        load_path = opt['path'].get('pretrain_network_d')
        if load_path is not None:
            self.params_d = self.replicate(self.load_network(
                load_path, opt['path'].get('strict_load_d', True),
                params_template=self.params_d))

        # EMA copy (reference: stylegan2_model.py:60-72)
        load_path = opt['path'].get('pretrain_network_g')
        if load_path is not None:
            self.params_g_ema = self.replicate(self.load_network(
                load_path, opt['path'].get('strict_load_g', True),
                param_key='params_ema', params_template=self.params_g))
        else:
            # real device copies — the G step donates its param buffers
            self.params_g_ema = jax.tree_util.tree_map(
                jnp.copy, self.params_g)

        self.cri_gan = build_loss(train_opt['gan_opt'])
        self.r1_reg_weight = train_opt['r1_reg_weight']
        self.path_reg_weight = train_opt['path_reg_weight']
        self.net_g_reg_every = train_opt['net_g_reg_every']
        self.net_d_reg_every = train_opt['net_d_reg_every']
        self.mixing_prob = train_opt['mixing_prob']
        self.path_batch_shrink = train_opt.get('path_batch_shrink', 2)
        self.mean_path_length = jnp.float32(0.)

        self.setup_optimizers()
        self.setup_schedulers()
        self._build_steps()

    def setup_optimizers(self):
        """Lazy-regularization-adjusted Adam
        (reference: stylegan2_model.py:96-185)."""
        train_opt = self.opt['train']
        g_ratio = self.net_g_reg_every / (self.net_g_reg_every + 1)
        d_ratio = self.net_d_reg_every / (self.net_d_reg_every + 1)
        self.base_lr_g = train_opt['optim_g']['lr'] * g_ratio
        self.base_lr_d = train_opt['optim_d']['lr'] * d_ratio
        self.tx_g = optax.scale_by_adam(b1=0**g_ratio, b2=0.99**g_ratio)
        self.tx_d = optax.scale_by_adam(b1=0**d_ratio, b2=0.99**d_ratio)
        self.opt_state_g = self.replicate(self.tx_g.init(self.params_g))
        self.opt_state_d = self.replicate(self.tx_d.init(self.params_d))

    def _optimizer_base_lrs(self):
        return {'optimizer_g': self.base_lr_g, 'optimizer_d': self.base_lr_d}

    def _optimizer_states(self):
        return {'optimizer_g': self.opt_state_g,
                'optimizer_d': self.opt_state_d}

    def _load_optimizer_states(self, states):
        cast = lambda t, v: np.asarray(v).astype(t.dtype)
        self.opt_state_g = self.replicate(jax.tree_util.tree_map(
            cast, self.opt_state_g, states['optimizer_g']))
        self.opt_state_d = self.replicate(jax.tree_util.tree_map(
            cast, self.opt_state_d, states['optimizer_d']))

    # ------------------------------------------------------------------ #
    def _g_forward(self, params_g, n1, n2, mix, inject_index, rng,
                   return_latents=False):
        """Generate with style mixing compiled into one trace."""
        variables = {'params': params_g, 'noises': self.noises_g}
        s1 = self.net_g.apply(variables, n1,
                              method=self.net_g.style_mlp)
        s2 = self.net_g.apply(variables, n2,
                              method=self.net_g.style_mlp)
        nl = self.net_g.num_latent
        lat1 = jnp.repeat(s1[:, None], nl, axis=1)
        lat2 = jnp.repeat(s2[:, None], nl, axis=1)
        pos = jnp.arange(nl)[None, :, None]
        latent = jnp.where(mix & (pos >= inject_index), lat2, lat1)
        img, _ = self.net_g.apply(variables, [latent],
                                  input_is_latent=True,
                                  rngs={'noise': rng})
        return (img, latent) if return_latents else img

    def _build_steps(self):
        net_d = self.net_d
        cri_gan = self.cri_gan
        tx_g, tx_d = self.tx_g, self.tx_d

        def d_apply(pd, img):
            return net_d.apply({'params': pd}, img)

        def d_step(params_g, params_d, opt_d, real_img, n1, n2, mix,
                   inject, rng, lr_d):
            fake_img = jax.lax.stop_gradient(
                self._g_forward(params_g, n1, n2, mix, inject, rng))

            def loss_fn(pd):
                fake_pred = d_apply(pd, fake_img)
                real_pred = d_apply(pd, real_img)
                l_d = cri_gan(real_pred, True, is_disc=True) + cri_gan(
                    fake_pred, False, is_disc=True)
                return l_d, (jnp.mean(real_pred), jnp.mean(fake_pred))

            (l_d, (real_score, fake_score)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params_d)
            updates, opt_d = tx_d.update(grads, opt_d, params_d)
            params_d = jax.tree_util.tree_map(lambda p, u: p - lr_d * u,
                                              params_d, updates)
            return params_d, opt_d, {'l_d': l_d, 'real_score': real_score,
                                     'fake_score': fake_score}

        def d_reg_step(params_d, opt_d, real_img, lr_d):
            def loss_fn(pd):
                l_r1 = r1_penalty(lambda img: d_apply(pd, img), real_img)
                return (self.r1_reg_weight / 2 * l_r1 *
                        self.net_d_reg_every)

            l_d_r1, grads = jax.value_and_grad(loss_fn)(params_d)
            updates, opt_d = tx_d.update(grads, opt_d, params_d)
            params_d = jax.tree_util.tree_map(lambda p, u: p - lr_d * u,
                                              params_d, updates)
            return params_d, opt_d, {'l_d_r1': l_d_r1}

        def g_step(params_g, opt_g, params_d, n1, n2, mix, inject, rng,
                   lr_g):
            def loss_fn(pg):
                fake_img = self._g_forward(pg, n1, n2, mix, inject, rng)
                fake_pred = d_apply(params_d, fake_img)
                return cri_gan(fake_pred, True, is_disc=False)

            l_g, grads = jax.value_and_grad(loss_fn)(params_g)
            updates, opt_g = tx_g.update(grads, opt_g, params_g)
            params_g = jax.tree_util.tree_map(lambda p, u: p - lr_g * u,
                                              params_g, updates)
            return params_g, opt_g, {'l_g': l_g}

        def g_reg_step(params_g, opt_g, n1, n2, mix, inject, rng,
                       path_noise, mean_path_length, lr_g):
            def loss_fn(pg):
                def fake_from_latent(latent):
                    variables = {'params': pg, 'noises': self.noises_g}
                    img, _ = self.net_g.apply(variables, [latent],
                                              input_is_latent=True,
                                              rngs={'noise': rng})
                    return img

                _, latent = self._g_forward(pg, n1, n2, mix, inject, rng,
                                            return_latents=True)
                l_path, path_lengths, new_mpl = g_path_regularize(
                    fake_from_latent, latent, path_noise, mean_path_length)
                loss = (self.path_reg_weight * self.net_g_reg_every *
                        l_path)
                return loss, (path_lengths, new_mpl)

            (l_g_path, (path_lengths, new_mpl)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params_g)
            updates, opt_g = tx_g.update(grads, opt_g, params_g)
            params_g = jax.tree_util.tree_map(lambda p, u: p - lr_g * u,
                                              params_g, updates)
            return params_g, opt_g, new_mpl, {'l_g_path': l_g_path,
                                              'path_length': path_lengths}

        def ema_step(params_g, params_ema, decay):
            return jax.tree_util.tree_map(
                lambda e, p: e * decay + p * (1 - decay), params_ema,
                params_g)

        self._d_step = jax.jit(d_step, donate_argnums=(1, 2))
        self._d_reg_step = jax.jit(d_reg_step, donate_argnums=(0, 1))
        self._g_step = jax.jit(g_step, donate_argnums=(0, 1))
        self._g_reg_step = jax.jit(g_reg_step, donate_argnums=(0, 1))
        self._ema_step = jax.jit(ema_step, donate_argnums=(1,))
        self._test_step = jax.jit(
            lambda pe, noises, sample, rng: self.net_g.apply(
                {'params': pe, 'noises': noises}, [sample],
                rngs={'noise': rng})[0])

    # ------------------------------------------------------------------ #
    def feed_data(self, data):
        self.real_img = self.shard_batch({'x': data['gt']})['x']

    def _mixing_args(self, batch):
        n1 = jnp.asarray(self._rng.randn(
            batch, self.num_style_feat).astype(np.float32))
        n2 = jnp.asarray(self._rng.randn(
            batch, self.num_style_feat).astype(np.float32))
        mix = bool(self._rng.rand() < self.mixing_prob)
        nl = self.net_g.num_latent
        inject = self._rng.randint(1, nl - 1) if mix else nl
        self._noise_key, sub = jax.random.split(self._noise_key)
        return n1, n2, jnp.bool_(mix), jnp.int32(inject), sub

    def optimize_parameters(self, current_iter):
        batch = self.real_img.shape[0]
        lr_g = jnp.float32(self.schedulers['optimizer_g'](current_iter))
        lr_d = jnp.float32(self.schedulers['optimizer_d'](current_iter))
        loss_dict = {}

        # ---- D ----
        n1, n2, mix, inject, rng = self._mixing_args(batch)
        self.params_d, self.opt_state_d, ld = self._d_step(
            self.params_g, self.params_d, self.opt_state_d, self.real_img,
            n1, n2, mix, inject, rng, lr_d)
        loss_dict.update(ld)

        if current_iter % self.net_d_reg_every == 0:
            self.params_d, self.opt_state_d, ld = self._d_reg_step(
                self.params_d, self.opt_state_d, self.real_img, lr_d)
            loss_dict.update(ld)

        # ---- G ----
        n1, n2, mix, inject, rng = self._mixing_args(batch)
        self.params_g, self.opt_state_g, lg = self._g_step(
            self.params_g, self.opt_state_g, self.params_d, n1, n2, mix,
            inject, rng, lr_g)
        loss_dict.update(lg)

        if current_iter % self.net_g_reg_every == 0:
            path_batch = max(1, batch // self.path_batch_shrink)
            n1, n2, mix, inject, rng = self._mixing_args(path_batch)
            out_size = self.opt['network_g']['out_size']
            path_noise = jnp.asarray(
                self._rng.randn(path_batch, out_size, out_size,
                                3).astype(np.float32)) / np.sqrt(
                                    out_size * out_size)
            (self.params_g, self.opt_state_g, self.mean_path_length,
             lg) = self._g_reg_step(
                self.params_g, self.opt_state_g, n1, n2, mix, inject, rng,
                path_noise, self.mean_path_length, lr_g)
            loss_dict.update(lg)

        self.log_dict = loss_dict

        # EMA (reference decay, stylegan2_model.py:293)
        self.params_g_ema = self._ema_step(self.params_g, self.params_g_ema,
                                           jnp.float32(0.5**(32 / (10 *
                                                                   1000))))

    # ------------------------------------------------------------------ #
    def test(self):
        self._noise_key, sub = jax.random.split(self._noise_key)
        self.output = self._test_step(self.eval_params(self.params_g_ema),
                                      self.noises_g, self.fixed_sample, sub)

    def dist_validation(self, dataloader, current_iter, tb_logger,
                        save_img):
        if self.opt.get('rank', 0) == 0:
            self.nondist_validation(dataloader, current_iter, tb_logger,
                                    save_img)

    def nondist_validation(self, dataloader, current_iter, tb_logger,
                           save_img):
        assert dataloader is None, 'Validation dataloader should be None.'
        self.test()
        # 4D input -> image grid (img_util.tensor2img handles tiling)
        result = tensor2img(np.asarray(self.output), min_max=(-1, 1))
        if self.opt['is_train']:
            save_img_path = osp.join(self.opt['path']['visualization'],
                                     'train', f'train_{current_iter}.png')
        else:
            save_img_path = osp.join(self.opt['path']['visualization'],
                                     'test', f'test_{self.opt["name"]}.png')
        imwrite(result, save_img_path)
        if tb_logger is not None:
            rgb = cv2.cvtColor((result / 255.).astype(np.float32),
                               cv2.COLOR_BGR2RGB)
            tb_logger.add_image('samples', rgb, global_step=current_iter,
                                dataformats='HWC')

    def get_current_visuals(self):
        return {'result': np.asarray(self.output)}

    def save(self, epoch, current_iter):
        import os
        from edvr_tpu.models.base_model import dump_checkpoint
        from edvr_tpu.parallel.dist_util import get_dist_info
        if get_dist_info()[0] == 0:
            if current_iter == -1:
                current_iter = 'latest'
            path = osp.join(self.opt['path']['models'],
                            f'net_g_{current_iter}.ckpt')
            os.makedirs(osp.dirname(path), exist_ok=True)
            host = jax.tree_util.tree_map(np.asarray, {
                'params': self.params_g, 'params_ema': self.params_g_ema})
            dump_checkpoint(host, path)
        self.save_network(self.params_d, 'net_d', current_iter)
        self.save_training_state(epoch, current_iter)
