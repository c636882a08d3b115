"""EDVR training engine (reference: basicsr/models/edvr_model.py).

Adds the DCN lr multiplier (edvr_model.py:21-53) and the TSA-warmup
phase — first ``tsa_iter`` iterations train only ``fusion.*`` params
(edvr_model.py:55-71). Both are compiled into the single train step:
the lr multiplier scales the optimizer update per leaf; the warmup is a
gradient mask gated on the iteration counter, so no recompilation or
optimizer rebuild happens at the phase switch (Adam moments of frozen
params stay zero while their grads are masked, matching the
requires_grad=False behavior).
"""

from __future__ import annotations

import os

import jax

from edvr_tpu.models.video_base_model import VideoBaseModel
from edvr_tpu.utils import get_root_logger
from edvr_tpu.utils.registry import MODEL_REGISTRY


def _tree_path_multiplier(params, match, mult_if_match, mult_else):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def build(path_leaf):
        path, leaf = path_leaf
        name = '/'.join(str(getattr(k, 'key', k)) for k in path)
        return mult_if_match if match in name else mult_else

    leaves = [build(pl) for pl in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, leaves)


@MODEL_REGISTRY.register()
class EDVRModel(VideoBaseModel):

    def __init__(self, opt):
        super().__init__(opt)
        if self.is_train:
            if os.environ.get('EDVR_TPU_DCN_QUANT'):
                # the quantization knob snaps sample positions through
                # jnp.round, whose gradient is zero — training with it
                # set would silently freeze offset learning (measured
                # trade study: docs/TPUDesign.md "DCN env-knob
                # reference"). Inference-only; refuse loudly here.
                raise RuntimeError(
                    'EDVR_TPU_DCN_QUANT is an inference-only '
                    'approximation knob: jnp.round has zero gradient, '
                    'so training with it set would freeze DCN offset '
                    'learning. Unset it for training runs.')
            self.train_tsa_iter = opt['train'].get('tsa_iter')

    def _update_multipliers(self):
        dcn_lr_mul = self.opt['train'].get('dcn_lr_mul', 1)
        get_root_logger().info(
            f'Multiple the learning rate for dcn with {dcn_lr_mul}.')
        if dcn_lr_mul == 1:
            return None
        return _tree_path_multiplier(self.params_g, 'dcn', dcn_lr_mul, 1.0)

    def _freeze_mask(self):
        tsa_iter = self.opt['train'].get('tsa_iter')
        if not tsa_iter:
            return None, 0
        get_root_logger().info(
            f'Only train TSA module for the first {tsa_iter} iters.')
        mask = _tree_path_multiplier(self.params_g, 'fusion', 1.0, 0.0)
        return mask, tsa_iter

    def optimize_parameters(self, current_iter):
        if self.is_train and self.train_tsa_iter and \
                current_iter == self.train_tsa_iter:
            get_root_logger().warning('Train all the parameters.')
        super().optimize_parameters(current_iter)
