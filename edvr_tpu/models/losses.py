"""Losses (pure JAX callables) with the reference's class API.

Equivalents of reference basicsr/models/losses/losses.py and
loss_util.py: the ``weighted_loss`` semantics (elementwise core,
optional elementwise weight, 'none'/'mean'/'sum' reduction), pixel
losses, TV loss, GAN losses, and the StyleGAN2 regularizers. JAX
autodiff replaces torch.autograd.grad for the gradient-based penalties.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from edvr_tpu.utils.registry import LOSS_REGISTRY

_reduction_modes = ['none', 'mean', 'sum']


def _reduce(loss, weight, reduction):
    """weighted_loss semantics (reference: losses/loss_util.py:5-100):
    apply elementwise weight, then reduce."""
    if weight is not None:
        loss = loss * weight
    if reduction == 'none':
        return loss
    if reduction == 'mean':
        # reference divides by the *unweighted* element count when weight
        # covers all elements (loss_util reduce_loss uses torch mean)
        return jnp.mean(loss)
    if reduction == 'sum':
        return jnp.sum(loss)
    raise ValueError(f'Unsupported reduction mode: {reduction}. '
                     f'Supported ones are: {_reduction_modes}')


@LOSS_REGISTRY.register()
class L1Loss:
    """(reference: losses.py:28-55)"""

    def __init__(self, loss_weight=1.0, reduction='mean'):
        if reduction not in _reduction_modes:
            raise ValueError(f'Unsupported reduction mode: {reduction}.')
        self.loss_weight = loss_weight
        self.reduction = reduction

    def __call__(self, pred, target, weight=None, **kwargs):
        return self.loss_weight * _reduce(
            jnp.abs(pred - target), weight, self.reduction)


@LOSS_REGISTRY.register()
class MSELoss:
    """(reference: losses.py:58-85)"""

    def __init__(self, loss_weight=1.0, reduction='mean'):
        if reduction not in _reduction_modes:
            raise ValueError(f'Unsupported reduction mode: {reduction}.')
        self.loss_weight = loss_weight
        self.reduction = reduction

    def __call__(self, pred, target, weight=None, **kwargs):
        return self.loss_weight * _reduce(
            (pred - target)**2, weight, self.reduction)


@LOSS_REGISTRY.register()
class CharbonnierLoss:
    """sqrt(diff^2 + eps), eps controls curvature near zero
    (reference: losses.py:88-122; note eps default 1e-12)."""

    def __init__(self, loss_weight=1.0, reduction='mean', eps=1e-12):
        if reduction not in _reduction_modes:
            raise ValueError(f'Unsupported reduction mode: {reduction}.')
        self.loss_weight = loss_weight
        self.reduction = reduction
        self.eps = eps

    def __call__(self, pred, target, weight=None, **kwargs):
        return self.loss_weight * _reduce(
            jnp.sqrt((pred - target)**2 + self.eps), weight, self.reduction)


@LOSS_REGISTRY.register()
class WeightedTVLoss(L1Loss):
    """Weighted total-variation loss (reference: losses.py:125-143).
    Operates on NHWC arrays (the reference is NCHW)."""

    def __init__(self, loss_weight=1.0):
        super().__init__(loss_weight=loss_weight)

    def __call__(self, pred, weight=None):
        wy = weight[:, :-1, :, :] if weight is not None else None
        wx = weight[:, :, :-1, :] if weight is not None else None
        y_diff = super().__call__(pred[:, :-1, :, :], pred[:, 1:, :, :],
                                  weight=wy)
        x_diff = super().__call__(pred[:, :, :-1, :], pred[:, :, 1:, :],
                                  weight=wx)
        return x_diff + y_diff


@LOSS_REGISTRY.register()
class GANLoss:
    """GAN losses: vanilla/lsgan/wgan/wgan_softplus/hinge
    (reference: losses.py:262-370). ``loss_weight`` applies only to the
    generator side (is_disc=False), like the reference."""

    def __init__(self, gan_type, real_label_val=1.0, fake_label_val=0.0,
                 loss_weight=1.0):
        self.gan_type = gan_type
        self.loss_weight = loss_weight
        self.real_label_val = real_label_val
        self.fake_label_val = fake_label_val
        if gan_type not in ('vanilla', 'lsgan', 'wgan', 'wgan_softplus',
                            'hinge'):
            raise NotImplementedError(
                f'GAN type {gan_type} is not implemented.')

    def _core(self, x, target_is_real, is_disc):
        if self.gan_type == 'vanilla':
            target = self.real_label_val if target_is_real else \
                self.fake_label_val
            t = jnp.full_like(x, target)
            # BCEWithLogits
            loss = jnp.mean(jnp.maximum(x, 0) - x * t +
                            jnp.log1p(jnp.exp(-jnp.abs(x))))
        elif self.gan_type == 'lsgan':
            target = self.real_label_val if target_is_real else \
                self.fake_label_val
            loss = jnp.mean((x - target)**2)
        elif self.gan_type == 'wgan':
            loss = -jnp.mean(x) if target_is_real else jnp.mean(x)
        elif self.gan_type == 'wgan_softplus':
            loss = jnp.mean(jax.nn.softplus(-x)) if target_is_real else \
                jnp.mean(jax.nn.softplus(x))
        elif self.gan_type == 'hinge':
            if is_disc:
                x = -x if target_is_real else x
                loss = jnp.mean(jax.nn.relu(1 + x))
            else:
                loss = -jnp.mean(x)
        return loss

    def __call__(self, x, target_is_real, is_disc=False):
        loss = self._core(x, target_is_real, is_disc)
        return loss if is_disc else loss * self.loss_weight


def r1_penalty(disc_fn, real_img):
    """R1 gradient penalty on real data (reference: losses.py:373-388).

    Args:
        disc_fn: img -> logits.
        real_img: (n, h, w, c).
    """
    grad_real = jax.grad(lambda img: jnp.sum(disc_fn(img)))(real_img)
    return jnp.mean(jnp.sum(grad_real.reshape(grad_real.shape[0], -1)**2,
                            axis=1))


def g_path_regularize(fake_fn, latents, noise, mean_path_length, decay=0.01):
    """Path-length regularization (reference: losses.py:391-403).

    Args:
        fake_fn: latents -> fake image (n, h, w, c).
        latents: (n, num_latents, latent_dim).
        noise: pre-scaled noise image (same shape as fake image), i.e.
            randn / sqrt(H*W) — passed in because JAX RNG is explicit.
    """
    _, vjp = jax.vjp(fake_fn, latents)
    grad = vjp(noise)[0]
    path_lengths = jnp.sqrt(jnp.mean(jnp.sum(grad**2, axis=2), axis=1))
    path_mean = mean_path_length + decay * (
        jnp.mean(path_lengths) - mean_path_length)
    path_penalty = jnp.mean((path_lengths - path_mean)**2)
    return path_penalty, jnp.mean(path_lengths), jax.lax.stop_gradient(
        path_mean)


def gradient_penalty_loss(disc_fn, real_data, fake_data, alpha, weight=None):
    """WGAN-GP gradient penalty (reference: losses.py:406-442).

    alpha: (n, 1, 1, 1) uniform random (explicit RNG in JAX).
    """
    interpolates = alpha * real_data + (1. - alpha) * fake_data
    grad = jax.grad(lambda x: jnp.sum(disc_fn(x)))(interpolates)
    if weight is not None:
        grad = grad * weight
    gp = jnp.mean((jnp.linalg.norm(
        grad.reshape(grad.shape[0], -1), axis=1) - 1)**2)
    if weight is not None:
        gp = gp / jnp.mean(weight)
    return gp


def build_loss(opt: dict):
    """Instantiate a loss from its YAML option dict."""
    opt = dict(opt)
    loss_type = opt.pop('type')
    return LOSS_REGISTRY.get(loss_type)(**opt)


@LOSS_REGISTRY.register()
class PerceptualLoss:
    """Perceptual + style loss on VGG features
    (reference: losses.py:146-259). Holds frozen VGG params internally;
    they become constants in the compiled train step.

    Args:
        layer_weights: {layer_name: weight}, e.g. {'conv5_4': 1.}.
        vgg_pretrain_path: converted torchvision vgg .pth; defaults to
            the reference's VGG_PRETRAIN_PATH if it exists, else the VGG
            is randomly initialized (useful only for tests).
    """

    def __init__(self, layer_weights, vgg_type='vgg19', use_input_norm=True,
                 range_norm=False, perceptual_weight=1.0, style_weight=0.,
                 criterion='l1', vgg_pretrain_path=None):
        import os

        import jax as _jax

        from edvr_tpu.archs.vgg_arch import (VGG_PRETRAIN_PATH,
                                             VGGFeatureExtractor,
                                             load_vgg_weights)
        from edvr_tpu.utils import get_root_logger

        self.perceptual_weight = perceptual_weight
        self.style_weight = style_weight
        self.layer_weights = layer_weights
        self.criterion_type = criterion
        if criterion not in ('l1', 'l2', 'fro'):
            raise NotImplementedError(
                f'{criterion} criterion has not been supported.')

        self.vgg = VGGFeatureExtractor(
            layer_name_list=tuple(layer_weights.keys()), vgg_type=vgg_type,
            use_input_norm=use_input_norm, range_norm=range_norm)
        variables = self.vgg.init(_jax.random.PRNGKey(0),
                                  jnp.zeros((1, 32, 32, 3)))
        path = vgg_pretrain_path or VGG_PRETRAIN_PATH
        if os.path.exists(path):
            # bn variants carry a batch_stats collection; plain VGG is
            # params-only — convert whatever the template holds
            self.vgg_variables = load_vgg_weights(path, dict(variables))
        else:
            get_root_logger().warning(
                f'VGG pretrain weights not found at {path}; PerceptualLoss '
                'uses a randomly initialized VGG (tests only).')
            self.vgg_variables = dict(variables)

    def _features(self, x):
        return self.vgg.apply(self.vgg_variables, x)

    def _crit(self, a, b):
        if self.criterion_type == 'l1':
            return jnp.mean(jnp.abs(a - b))
        if self.criterion_type == 'l2':
            return jnp.mean((a - b)**2)
        return jnp.sqrt(jnp.sum((a - b)**2))  # frobenius

    @staticmethod
    def _gram_mat(x):
        """(n, h, w, c) -> (n, c, c) gram / (c*h*w)
        (reference: losses.py:249-259)."""
        n, h, w, c = x.shape
        feats = x.reshape(n, h * w, c)
        return jnp.einsum('npc,npd->ncd', feats, feats) / (c * h * w)

    def __call__(self, x, gt):
        x_features = self._features(x)
        gt_features = self._features(jax.lax.stop_gradient(gt))

        percep_loss = None
        if self.perceptual_weight > 0:
            percep_loss = 0.
            for k in x_features.keys():
                percep_loss += self._crit(
                    x_features[k], gt_features[k]) * self.layer_weights[k]
            percep_loss = percep_loss * self.perceptual_weight

        style_loss = None
        if self.style_weight > 0:
            style_loss = 0.
            for k in x_features.keys():
                style_loss += self._crit(
                    self._gram_mat(x_features[k]),
                    self._gram_mat(gt_features[k])) * self.layer_weights[k]
            style_loss = style_loss * self.style_weight

        return percep_loss, style_loss
