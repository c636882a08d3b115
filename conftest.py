"""Repo-root conftest: make `edvr_tpu` importable and force tests onto a
virtual 8-device CPU mesh so multi-device (data-parallel) logic is
exercised without TPUs."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ.setdefault('JAX_ENABLE_X64', '0')
