from edvr_tpu.ops.resize import interpolate, pixel_shuffle, pixel_unshuffle
from edvr_tpu.ops.sampling import bilinear_sample, flow_warp, resize_flow
from edvr_tpu.ops.fused_act import fused_leaky_relu
from edvr_tpu.ops.upfirdn2d import upfirdn2d
from edvr_tpu.ops.dcn import modulated_deform_conv

__all__ = [
    'interpolate', 'pixel_shuffle', 'pixel_unshuffle', 'bilinear_sample',
    'flow_warp', 'resize_flow', 'fused_leaky_relu', 'upfirdn2d',
    'modulated_deform_conv'
]
