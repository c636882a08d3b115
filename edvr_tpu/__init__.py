"""edvr_tpu: TPU-native image & video restoration framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of BasicSR
v1.2.0 / xinntao-EDVR: YAML-option-driven training and testing of
single-image SR (SRResNet/EDSR/RCAN/ESRGAN), video SR/deblur (EDVR with
PCD deformable alignment and TSA fusion), StyleGAN2, and DFDNet face
restoration, plus metrics (PSNR/SSIM/NIQE/FID), data pipelines, and
distributed data-parallel training over TPU meshes.

Design: pure-functional flax.linen models in NHWC layout, one jitted
train step per engine, optax optimizers, header-guarded single-writer
checkpoints (docs/TPUDesign.md "Checkpoint format"), host-side input
pipeline, `jax.sharding.Mesh`-based parallelism. Public config /
registry / metric semantics match the reference toolbox (see SURVEY.md).
"""

__version__ = '0.1.0'

import os as _os

if _os.environ.get('EDVR_TPU_PLATFORM'):
    # Force the JAX platform (e.g. 'cpu') from the environment. Some
    # managed TPU environments rewrite JAX_PLATFORMS during interpreter
    # bootstrap, so the standard env var cannot be trusted to reach
    # jax; config.update before first backend use always works.
    import jax as _jax

    _jax.config.update('jax_platforms',
                       _os.environ['EDVR_TPU_PLATFORM'])
