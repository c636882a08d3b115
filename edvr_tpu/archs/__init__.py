"""Architectures, resolved by YAML ``type`` names
(reference: basicsr/models/archs/__init__.py:10-46)."""

from copy import deepcopy

# importing the modules registers the classes
from edvr_tpu.archs import (edsr_arch, edvr_arch, rrdbnet_arch,  # noqa: F401
                            srresnet_arch)
from edvr_tpu.archs.edvr_arch import EDVR, PCDAlignment, TSAFusion
from edvr_tpu.archs.edsr_arch import EDSR
from edvr_tpu.archs.rrdbnet_arch import RRDBNet
from edvr_tpu.archs.srresnet_arch import MSRResNet
from edvr_tpu.utils.registry import ARCH_REGISTRY

__all__ = ['define_network', 'ARCH_REGISTRY', 'EDVR', 'PCDAlignment',
           'TSAFusion', 'EDSR', 'RRDBNet', 'MSRResNet']


def define_network(opt: dict):
    """Instantiate an architecture from its YAML option dict
    (reference: basicsr/models/archs/__init__.py:43-46)."""
    opt = deepcopy(opt)
    network_type = opt.pop('type')
    return ARCH_REGISTRY.get(network_type)(**opt)
