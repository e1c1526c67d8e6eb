"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the jax analog of the reference's multi-GPU test conditioning
(reference tests condition on workspace.NumCudaDevices()); here sharding
logic is validated without TPU hardware via XLA host-platform devices.
"""

import os

os.environ['JAX_PLATFORMS'] = os.environ.get('PPS_TPU_TEST_PLATFORM', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# The axon sitecustomize registers the TPU plugin at interpreter start and
# programmatically sets jax_platforms; force CPU for the test mesh.
try:
    jax.config.update('jax_platforms',
                      os.environ.get('PPS_TPU_TEST_PLATFORM', 'cpu'))
except Exception:  # pragma: no cover - platform already initialized
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _fresh_cfg():
    """Reset the global config between tests."""
    from pps_tpu.config import reset_cfg
    reset_cfg()
    yield
    reset_cfg()


@pytest.fixture
def rng_np():
    return np.random.RandomState(11)
