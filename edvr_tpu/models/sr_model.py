"""Single-image SR training engine (reference: basicsr/models/sr_model.py).

The torch feed/forward/backward/step methods collapse into one jitted
pure train step over the device mesh: batch sharded on the 'data' axis,
params/optimizer state replicated, gradient all-reduce compiled into
the step. Adam matches torch semantics (weight decay added to the grad
before the moments, eps inside the sqrt denominator).
"""

from __future__ import annotations

from copy import deepcopy
from os import path as osp

import jax
import jax.numpy as jnp
import numpy as np
import optax

from edvr_tpu.archs import define_network
from edvr_tpu.metrics import calculate_metric
from edvr_tpu.models.base_model import BaseModel
from edvr_tpu.models.losses import build_loss
from edvr_tpu.utils import get_root_logger, imwrite, tensor2img
from edvr_tpu.utils.registry import MODEL_REGISTRY


@MODEL_REGISTRY.register()
class SRModel(BaseModel):

    def __init__(self, opt):
        super().__init__(opt)

        # validate the mixed-precision policy up front (not only inside
        # _make_train_step) so a typo'd value fails loudly even for a
        # test-mode config that carries a train block
        mp = (opt.get('train') or {}).get('mixed_precision')
        if mp not in (None, 'bf16'):
            raise NotImplementedError(
                f'mixed_precision {mp!r} is not supported (bf16 only).')

        self.net_g = define_network(deepcopy(opt['network_g']))
        self._init_params()
        self.print_network(self.net_g, self.params_g)

        load_path = self.opt['path'].get('pretrain_network_g')
        if load_path is not None:
            self.params_g = self.replicate(
                self.load_network(
                    load_path, self.opt['path'].get('strict_load_g', True),
                    param_key=self.opt['path'].get('param_key_g', 'params'),
                    params_template=self.params_g))

        # optional strict matmul precision for published-number parity
        # (the TPU default allows bf16 passes; set val.matmul_precision:
        # float32 to evaluate with full-precision matmuls/convs)
        val_prec = (self.opt.get('val') or {}).get('matmul_precision')

        def _fwd(p, lq):
            if val_prec:
                with jax.default_matmul_precision(val_prec):
                    return self.net_g.apply({'params': p}, lq)
            return self.net_g.apply({'params': p}, lq)

        self._test_step = jax.jit(_fwd)

        if self.is_train:
            self.init_training_settings()

    # ------------------------------------------------------------------ #
    def _init_params(self):
        seed = self.opt.get('manual_seed') or 0
        rng = jax.random.PRNGKey(seed)
        sample = self._sample_input()
        variables = self.net_g.init(rng, sample)
        self.params_g = self.replicate(variables['params'])

    def _sample_input(self):
        c = self.opt['network_g'].get('num_in_ch', 3)
        return jnp.zeros((1, 16, 16, c), jnp.float32)

    def init_training_settings(self):
        train_opt = self.opt['train']

        self.cri_pix = build_loss(train_opt['pixel_opt']) if train_opt.get(
            'pixel_opt') else None
        self.cri_perceptual = None
        if train_opt.get('perceptual_opt'):
            self.cri_perceptual = build_loss(train_opt['perceptual_opt'])
        if self.cri_pix is None and self.cri_perceptual is None:
            raise ValueError('Both pixel and perceptual losses are None.')

        self.setup_optimizers()
        self.setup_schedulers()
        self._train_step = self._make_train_step()

    # ------------------------------------------------------------------ #
    def setup_optimizers(self):
        train_opt = self.opt['train']
        optim_opt = dict(train_opt['optim_g'])
        optim_type = optim_opt.pop('type')
        if optim_type != 'Adam':
            raise NotImplementedError(
                f'optimizer {optim_type} is not supported yet.')
        self.base_lr_g = optim_opt.pop('lr')
        betas = optim_opt.pop('betas', (0.9, 0.999))
        wd = optim_opt.pop('weight_decay', 0)
        chain = []
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1],
                                         eps=optim_opt.pop('eps', 1e-8)))
        self.tx_g = optax.chain(*chain)
        self.opt_state_g = self.replicate(self.tx_g.init(self.params_g))

    def _optimizer_base_lrs(self):
        return {'optimizer_g': self.base_lr_g}

    def _optimizer_states(self):
        return {'optimizer_g': self.opt_state_g}

    def _load_optimizer_states(self, states):
        self.opt_state_g = self.replicate(
            jax.tree_util.tree_map(
                lambda tmpl, val: np.asarray(val).astype(tmpl.dtype),
                self.opt_state_g, states['optimizer_g']))

    # hooks for subclasses ------------------------------------------------ #
    def _update_multipliers(self):
        """Per-leaf lr multipliers applied to the optimizer update
        (identity here; EDVR uses dcn_lr_mul)."""
        return None

    def _freeze_mask(self):
        """(mask_tree, until_iter): grads multiplied by mask while
        current_iter <= until_iter (identity here; EDVR's TSA warmup)."""
        return None, 0

    # ------------------------------------------------------------------ #
    def _make_train_step(self):
        net = self.net_g
        cri_pix = self.cri_pix
        cri_perceptual = self.cri_perceptual
        tx = self.tx_g
        mult = self._update_multipliers()
        mask, mask_until = self._freeze_mask()
        train_prec = self.opt['train'].get('matmul_precision')
        # train.mixed_precision: bf16 — bf16 compute/activations with f32
        # master params (grads come back f32 through the cast; Adam runs
        # f32). bf16 keeps f32's exponent range so no loss scaling is
        # needed; the loss itself is computed in f32. The win is HBM
        # traffic: the backward re-reads every activation, and the MXU
        # already rounds f32 operands to bf16 passes under the TPU
        # default precision, so only storage precision changes.
        mp = self.opt['train'].get('mixed_precision')
        if mp not in (None, 'bf16'):
            raise NotImplementedError(
                f'mixed_precision {mp!r} is not supported (bf16 only).')

        def step_fn(params, opt_state, lq, gt, lr, cur_iter):
            def loss_fn(p):
                x = lq
                if mp == 'bf16':
                    p = jax.tree_util.tree_map(
                        lambda a: a.astype(jnp.bfloat16), p)
                    x = lq.astype(jnp.bfloat16)
                if train_prec:
                    with jax.default_matmul_precision(train_prec):
                        output = net.apply({'params': p}, x)
                else:
                    output = net.apply({'params': p}, x)
                output = output.astype(jnp.float32)
                losses = {}
                l_total = 0.
                if cri_pix is not None:
                    l_pix = cri_pix(output, gt)
                    l_total += l_pix
                    losses['l_pix'] = l_pix
                if cri_perceptual is not None:
                    l_percep, l_style = cri_perceptual(output, gt)
                    if l_percep is not None:
                        l_total += l_percep
                        losses['l_percep'] = l_percep
                    if l_style is not None:
                        l_total += l_style
                        losses['l_style'] = l_style
                return l_total, losses

            (_, losses), grads = jax.value_and_grad(loss_fn,
                                                    has_aux=True)(params)
            if mask is not None:
                # the reference unfreezes at current_iter == tsa_iter
                # (edvr_model.py:62-69), so the mask applies strictly before
                in_warmup = (cur_iter < mask_until).astype(jnp.float32)
                grads = jax.tree_util.tree_map(
                    lambda g, m: g * (in_warmup * m + (1 - in_warmup)),
                    grads, mask)
            updates, opt_state = tx.update(grads, opt_state, params)
            if mult is not None:
                updates = jax.tree_util.tree_map(lambda u, m: u * m, updates,
                                                 mult)
            params = jax.tree_util.tree_map(
                lambda p, u: p - lr * u, params, updates)
            return params, opt_state, losses

        donate = (0, 1)
        return jax.jit(step_fn, donate_argnums=donate)

    # ------------------------------------------------------------------ #
    def feed_data(self, data):
        self.lq = self.shard_batch({'x': data['lq']})['x']
        if 'gt' in data:
            self.gt = self.shard_batch({'x': data['gt']})['x']

    def optimize_parameters(self, current_iter):
        lr = jnp.float32(self.schedulers['optimizer_g'](current_iter))
        self.params_g, self.opt_state_g, losses = self._train_step(
            self.params_g, self.opt_state_g, self.lq, self.gt, lr,
            jnp.int32(current_iter))
        self.log_dict = losses  # device scalars; converted lazily

    def test(self):
        self.output = self._test_step(self.eval_params(self.params_g),
                                      self.lq)

    def get_current_log(self):
        return self.reduce_loss_dict(self.log_dict)

    def get_current_visuals(self):
        out = {'lq': np.asarray(self.lq), 'result': np.asarray(self.output)}
        if hasattr(self, 'gt'):
            out['gt'] = np.asarray(self.gt)
        return out

    # ------------------------------------------------------------------ #
    def dist_validation(self, dataloader, current_iter, tb_logger,
                        save_img):
        get_root_logger().info('Only support single process validation.')
        self.nondist_validation(dataloader, current_iter, tb_logger,
                                save_img)

    def nondist_validation(self, dataloader, current_iter, tb_logger,
                           save_img):
        """(reference: sr_model.py:125-184)"""
        dataset_name = dataloader.dataset.opt['name']
        with_metrics = self.opt['val'].get('metrics') is not None
        if with_metrics:
            self.metric_results = {
                metric: 0
                for metric in self.opt['val']['metrics'].keys()
            }

        cnt = 0
        for val_data in dataloader:
            img_name = osp.splitext(osp.basename(val_data['lq_path'][0]))[0]
            self.feed_data(val_data)
            self.test()

            visuals = self.get_current_visuals()
            sr_img = tensor2img([visuals['result']])
            metric_data = {'img1': sr_img}
            if 'gt' in visuals:
                metric_data['img2'] = tensor2img([visuals['gt']])
                del self.gt

            if save_img:
                if self.opt['is_train']:
                    save_img_path = osp.join(
                        self.opt['path']['visualization'], img_name,
                        f'{img_name}_{current_iter}.png')
                elif self.opt['val'].get('suffix'):
                    save_img_path = osp.join(
                        self.opt['path']['visualization'], dataset_name,
                        f'{img_name}_{self.opt["val"]["suffix"]}.png')
                else:
                    save_img_path = osp.join(
                        self.opt['path']['visualization'], dataset_name,
                        f'{img_name}_{self.opt["name"]}.png')
                imwrite(sr_img, save_img_path)

            if with_metrics:
                for name, opt_ in deepcopy(
                        self.opt['val']['metrics']).items():
                    self.metric_results[name] += calculate_metric(
                        metric_data, opt_)
            cnt += 1

        if with_metrics:
            for metric in self.metric_results.keys():
                self.metric_results[metric] /= cnt
            self._log_validation_metric_values(current_iter, dataset_name,
                                               tb_logger)

    def _log_validation_metric_values(self, current_iter, dataset_name,
                                      tb_logger):
        # current_iter is an int while training, a checkpoint label
        # string under the test CLI
        log_str = f'Validation {dataset_name} (iter {current_iter})\n'
        for metric, value in self.metric_results.items():
            log_str += f'\t # {metric}: {value:.4f}\n'
        get_root_logger().info(log_str)
        if tb_logger:
            for metric, value in self.metric_results.items():
                tb_logger.add_scalar(f'metrics/{metric}', value,
                                     current_iter)

    def save(self, epoch, current_iter):
        self.save_network(self.params_g, 'net_g', current_iter)
        self.save_training_state(epoch, current_iter)
