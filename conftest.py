"""Repo-root conftest: make `edvr_tpu` importable and force tests onto a
virtual 8-device CPU mesh so multi-device (data-parallel) logic is
exercised without TPUs.

Note: this environment's sitecustomize pre-registers a TPU ('axon')
backend and overrides the JAX_PLATFORMS env var, so the platform must be
forced via jax.config *after* import.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('JAX_ENABLE_X64', '0')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
# deterministic f32 numerics for parity tests (the TPU default allows
# bf16 passes in matmuls/convs)
jax.config.update('jax_default_matmul_precision', 'float32')


def pytest_sessionstart(session):
    assert jax.default_backend() == 'cpu', jax.default_backend()
    assert jax.device_count() == 8, jax.devices()
