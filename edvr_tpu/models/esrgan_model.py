"""ESRGAN engine: relativistic GAN losses
(reference: basicsr/models/esrgan_model.py)."""

from __future__ import annotations

import jax.numpy as jnp

from edvr_tpu.models.srgan_model import SRGANModel
from edvr_tpu.utils.registry import MODEL_REGISTRY


@MODEL_REGISTRY.register()
class ESRGANModel(SRGANModel):
    """Relativistic average GAN (esrgan_model.py:40-88)."""

    _g_gan_needs_real = True

    def _g_gan_loss(self, d_fake, d_real):
        l_g_real = self.cri_gan(d_real - jnp.mean(d_fake), False,
                                is_disc=False)
        l_g_fake = self.cri_gan(d_fake - jnp.mean(d_real), True,
                                is_disc=False)
        return (l_g_real + l_g_fake) / 2

    def _d_losses(self, d_real, d_fake):
        # the reference detaches the opposing mean in each term
        # (esrgan_model.py:70-82)
        import jax
        l_d_real = self.cri_gan(
            d_real - jnp.mean(jax.lax.stop_gradient(d_fake)), True,
            is_disc=True) * 0.5
        l_d_fake = self.cri_gan(
            d_fake - jnp.mean(jax.lax.stop_gradient(d_real)), False,
            is_disc=True) * 0.5
        return l_d_real, l_d_fake
