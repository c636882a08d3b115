"""SRGAN training engine (reference: basicsr/models/srgan_model.py).

One jitted step runs both the generator and discriminator updates:
G grads are taken with D frozen (the closure simply doesn't
differentiate wrt params_d), the G update is gated on the
``net_d_iters``/``net_d_init_iters`` schedule inside the compiled step,
then D trains on (real, detached fake). Discriminators with BatchNorm
(VGGStyleDiscriminator128) thread their batch statistics through the
three D forwards in the reference's order (G-step fake pred -> D real
-> D fake).
"""

from __future__ import annotations

from copy import deepcopy

import jax
import jax.numpy as jnp
import optax

from edvr_tpu.archs import define_network
from edvr_tpu.models.losses import build_loss
from edvr_tpu.models.sr_model import SRModel
from edvr_tpu.utils.registry import MODEL_REGISTRY


def _make_adam(optim_opt: dict):
    optim_opt = dict(optim_opt)
    optim_type = optim_opt.pop('type')
    if optim_type != 'Adam':
        raise NotImplementedError(
            f'optimizer {optim_type} is not supported yet.')
    lr = optim_opt.pop('lr')
    betas = optim_opt.pop('betas', (0.9, 0.999))
    wd = optim_opt.pop('weight_decay', 0)
    chain = []
    if wd:
        chain.append(optax.add_decayed_weights(wd))
    chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1],
                                     eps=optim_opt.pop('eps', 1e-8)))
    return optax.chain(*chain), lr


@MODEL_REGISTRY.register()
class SRGANModel(SRModel):

    def init_training_settings(self):
        train_opt = self.opt['train']
        if train_opt.get('mixed_precision'):
            # the GAN engines build their own G/D steps; fail loudly
            # rather than silently training in f32 under an mp config
            raise NotImplementedError(
                'mixed_precision is only supported by the SRModel-step '
                'family (SRModel/VideoBaseModel/EDVRModel).')

        self.net_d = define_network(deepcopy(self.opt['network_d']))
        self._init_d_params()
        self.print_network(self.net_d, self.params_d)
        load_path = self.opt['path'].get('pretrain_network_d')
        if load_path is not None:
            strict = self.opt['path'].get('strict_load_d', True)
            pkey = self.opt['path'].get('param_key_d', 'params')
            if load_path.endswith('.pth') and self.bstats_d:
                # BN discriminators: torch state_dicts carry running
                # stats; convert params + batch_stats together
                from edvr_tpu.convert import (convert_state_dict,
                                              load_torch_weights)
                state = load_torch_weights(load_path, pkey)
                converted, unmatched = convert_state_dict(
                    state, {'params': self.params_d,
                            'batch_stats': self.bstats_d})
                if unmatched:
                    msg = f'Unconverted torch keys: {unmatched}'
                    if strict:
                        raise ValueError(msg)
                self.params_d = self.replicate(converted['params'])
                self.bstats_d = self.replicate(converted['batch_stats'])
            else:
                self.params_d = self.replicate(self.load_network(
                    load_path, strict, param_key=pkey,
                    params_template=self.params_d))
                bstats = self.load_network_collection(load_path,
                                                      'batch_stats')
                if bstats is not None:
                    self.bstats_d = self.replicate(bstats)

        self.cri_pix = build_loss(train_opt['pixel_opt']) if train_opt.get(
            'pixel_opt') else None
        self.cri_perceptual = build_loss(
            train_opt['perceptual_opt']) if train_opt.get(
                'perceptual_opt') else None
        self.cri_gan = build_loss(train_opt['gan_opt']) if train_opt.get(
            'gan_opt') else None

        self.net_d_iters = train_opt.get('net_d_iters', 1)
        self.net_d_init_iters = train_opt.get('net_d_init_iters', 0)

        self.setup_optimizers()
        self.setup_schedulers()
        self._train_step = self._make_gan_train_step()

    def _init_d_params(self):
        seed = (self.opt.get('manual_seed') or 0) + 1
        sample = self._sample_d_input()
        variables = self.net_d.init(jax.random.PRNGKey(seed), sample)
        self.params_d = self.replicate(variables['params'])
        self.bstats_d = self.replicate(
            variables.get('batch_stats', {}))

    def _sample_d_input(self):
        size = 128 if self.opt['network_d'].get(
            'type') == 'VGGStyleDiscriminator128' else self.opt[
                'network_d'].get('out_size', 128)
        return jnp.zeros((1, size, size, 3), jnp.float32)

    def setup_optimizers(self):
        train_opt = self.opt['train']
        self.tx_g, self.base_lr_g = _make_adam(train_opt['optim_g'])
        self.opt_state_g = self.replicate(self.tx_g.init(self.params_g))
        self.tx_d, self.base_lr_d = _make_adam(train_opt['optim_d'])
        self.opt_state_d = self.replicate(self.tx_d.init(self.params_d))

    def _optimizer_base_lrs(self):
        return {'optimizer_g': self.base_lr_g, 'optimizer_d': self.base_lr_d}

    def _optimizer_states(self):
        return {'optimizer_g': self.opt_state_g,
                'optimizer_d': self.opt_state_d}

    def _load_optimizer_states(self, states):
        import numpy as np
        cast = lambda tmpl, val: np.asarray(val).astype(tmpl.dtype)
        self.opt_state_g = self.replicate(jax.tree_util.tree_map(
            cast, self.opt_state_g, states['optimizer_g']))
        self.opt_state_d = self.replicate(jax.tree_util.tree_map(
            cast, self.opt_state_d, states['optimizer_d']))

    # GAN formulation hooks (overridden by ESRGAN) ----------------------- #
    def _g_gan_loss(self, d_fake, d_real):
        """Standard GAN generator loss (srgan_model.py:108-111)."""
        return self.cri_gan(d_fake, True, is_disc=False)

    def _d_losses(self, d_real, d_fake):
        """Standard GAN discriminator losses (srgan_model.py:122-133)."""
        l_d_real = self.cri_gan(d_real, True, is_disc=True)
        l_d_fake = self.cri_gan(d_fake, False, is_disc=True)
        return l_d_real, l_d_fake

    _g_gan_needs_real = False

    def _make_gan_train_step(self):
        net_g, net_d = self.net_g, self.net_d
        cri_pix, cri_perceptual = self.cri_pix, self.cri_perceptual
        tx_g, tx_d = self.tx_g, self.tx_d
        has_bn = bool(jax.tree_util.tree_leaves(self.bstats_d))

        def d_apply(params_d, bstats, img, train=True):
            variables = {'params': params_d}
            if has_bn:
                variables['batch_stats'] = bstats
                out, updates = net_d.apply(variables, img,
                                           mutable=['batch_stats'])
                return out, updates['batch_stats']
            return net_d.apply(variables, img), bstats

        def step_fn(params_g, opt_g, params_d, opt_d, bstats, lq, gt, lr_g,
                    lr_d, do_g):
            losses = {}

            # ---- generator update (D frozen) ----
            def g_loss_fn(pg):
                output = net_g.apply({'params': pg}, lq)
                l_total = 0.
                ld = {}
                if cri_pix is not None:
                    l = cri_pix(output, gt)
                    l_total += l
                    ld['l_g_pix'] = l
                if cri_perceptual is not None:
                    lp, ls = cri_perceptual(output, gt)
                    if lp is not None:
                        l_total += lp
                        ld['l_g_percep'] = lp
                    if ls is not None:
                        l_total += ls
                        ld['l_g_style'] = ls
                d_real = None
                if self._g_gan_needs_real:
                    d_real, _ = d_apply(params_d, bstats, gt)
                    d_real = jax.lax.stop_gradient(d_real)
                d_fake, new_bs = d_apply(params_d, bstats, output)
                l_gan = self._g_gan_loss(d_fake, d_real)
                l_total += l_gan
                ld['l_g_gan'] = l_gan
                return l_total, (ld, output, new_bs)

            (_, (g_losses, output, bstats_after_g)), g_grads = \
                jax.value_and_grad(g_loss_fn, has_aux=True)(params_g)
            losses.update(g_losses)
            g_updates, new_opt_g = tx_g.update(g_grads, opt_g, params_g)
            flag = do_g.astype(jnp.float32)
            params_g = jax.tree_util.tree_map(
                lambda p, u: p - lr_g * flag * u, params_g, g_updates)
            new_opt_g = jax.tree_util.tree_map(
                lambda new, old: jnp.where(do_g, new, old) if
                hasattr(new, 'shape') and new.shape == getattr(
                    old, 'shape', None) else new, new_opt_g, opt_g)
            bstats = jax.tree_util.tree_map(
                lambda new, old: jnp.where(do_g, new, old),
                bstats_after_g, bstats) if has_bn else bstats

            # ---- discriminator update ----
            output_det = jax.lax.stop_gradient(output)

            def d_loss_fn(pd, bs):
                d_real, bs = d_apply(pd, bs, gt)
                d_fake, bs = d_apply(pd, bs, output_det)
                l_d_real, l_d_fake = self._d_losses(d_real, d_fake)
                return l_d_real + l_d_fake, (l_d_real, l_d_fake,
                                             jnp.mean(d_real),
                                             jnp.mean(d_fake), bs)

            (_, (l_d_real, l_d_fake, out_d_real, out_d_fake, bstats)), \
                d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
                    params_d, bstats)
            d_updates, new_opt_d = tx_d.update(d_grads, opt_d, params_d)
            params_d = jax.tree_util.tree_map(
                lambda p, u: p - lr_d * u, params_d, d_updates)
            losses.update({'l_d_real': l_d_real, 'l_d_fake': l_d_fake,
                           'out_d_real': out_d_real,
                           'out_d_fake': out_d_fake})
            return (params_g, new_opt_g, params_d, new_opt_d, bstats,
                    losses)

        return jax.jit(step_fn, donate_argnums=(0, 1, 2, 3, 4))

    def optimize_parameters(self, current_iter):
        do_g = (current_iter % self.net_d_iters == 0
                and current_iter > self.net_d_init_iters)
        lr_g = jnp.float32(self.schedulers['optimizer_g'](current_iter))
        lr_d = jnp.float32(self.schedulers['optimizer_d'](current_iter))
        (self.params_g, self.opt_state_g, self.params_d, self.opt_state_d,
         self.bstats_d, self.log_dict) = self._train_step(
            self.params_g, self.opt_state_g, self.params_d,
            self.opt_state_d, self.bstats_d, self.lq, self.gt, lr_g, lr_d,
            jnp.bool_(do_g))

    def save(self, epoch, current_iter):
        self.save_network(self.params_g, 'net_g', current_iter)
        extra = {'batch_stats': self.bstats_d} if self.bstats_d else None
        self.save_network(self.params_d, 'net_d', current_iter, extra=extra)
        self.save_training_state(epoch, current_iter)
