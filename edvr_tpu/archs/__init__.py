"""Architectures, resolved by YAML ``type`` names
(reference: basicsr/models/archs/__init__.py:10-46)."""

from copy import deepcopy

# importing the modules registers the classes
from edvr_tpu.archs import (dfdnet_arch, discriminator_arch,  # noqa: F401
                            duf_arch, edsr_arch, edvr_arch, rcan_arch,
                            rrdbnet_arch, spynet_arch, srresnet_arch,
                            stylegan2_arch, tof_arch, vgg_arch)
from edvr_tpu.archs.duf_arch import DUF
from edvr_tpu.archs.edvr_arch import EDVR, PCDAlignment, TSAFusion
from edvr_tpu.archs.edsr_arch import EDSR
from edvr_tpu.archs.rcan_arch import RCAN
from edvr_tpu.archs.rrdbnet_arch import RRDBNet
from edvr_tpu.archs.spynet_arch import SpyNet
from edvr_tpu.archs.srresnet_arch import MSRResNet
from edvr_tpu.archs.tof_arch import TOFlow
from edvr_tpu.utils.registry import ARCH_REGISTRY

__all__ = ['define_network', 'ARCH_REGISTRY', 'EDVR', 'PCDAlignment',
           'TSAFusion', 'EDSR', 'RCAN', 'RRDBNet', 'MSRResNet', 'DUF',
           'SpyNet', 'TOFlow']


def define_network(opt: dict):
    """Instantiate an architecture from its YAML option dict
    (reference: basicsr/models/archs/__init__.py:43-46)."""
    opt = deepcopy(opt)
    network_type = opt.pop('type')
    return ARCH_REGISTRY.get(network_type)(**opt)
