"""Video GAN engine: SRGAN training + video validation, composed by
multiple inheritance exactly like the reference
(reference: basicsr/models/video_gan_model.py:5-15)."""

from __future__ import annotations

from edvr_tpu.models.srgan_model import SRGANModel
from edvr_tpu.models.video_base_model import VideoBaseModel
from edvr_tpu.utils.registry import MODEL_REGISTRY


@MODEL_REGISTRY.register()
class VideoGANModel(SRGANModel, VideoBaseModel):
    """Uses SRGANModel's training and VideoBaseModel's validation via
    the MRO (the 5-D sample input comes from VideoBaseModel)."""
