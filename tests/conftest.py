"""Test harness: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; following the JAX-native pattern
(SURVEY.md section 4), tests run on CPU with 8 virtual devices so sharding
and collective code paths execute for real.

Note: this image's sitecustomize registers the axon TPU plugin in a way that
ignores the JAX_PLATFORMS env var, so the platform is forced through
jax.config before any device initialization.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# T2I_TEST_TPU=1 runs the suite against the real TPU backend instead (used
# for the Pallas-kernel parity tests, which skip on CPU).
if os.environ.get('T2I_TEST_TPU') != '1':
    jax.config.update('jax_platforms', 'cpu')

import pytest  # noqa: E402


@pytest.fixture(scope='session')
def devices():
    return jax.devices()
