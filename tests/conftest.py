"""Test harness config: force an 8-virtual-device CPU mesh (SURVEY.md §4.2).

Must run before any jax import: tests (including distributed ones) run on the
CPU backend with 8 fake devices so halo-exchange / sharding tests need no TPU.
Benchmarks (bench.py) use the real chip and do NOT import this.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Force CPU even if the ambient env selects a TPU platform: the unit/dist
# suites are defined to run on the fake 8-device CPU mesh. The env var alone
# is not enough here — this machine's sitecustomize imports jax at interpreter
# start (latching JAX_PLATFORMS), so override via jax.config too. Set
# SRCDSP_TEST_PLATFORM=tpu to opt in to on-device runs (bench/ does).
_platform = os.environ.get("SRCDSP_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """Signal-to-error ratio in dB between a reference and a test signal."""
    ref = np.asarray(ref)
    test = np.asarray(test)
    err = ref - test
    p_sig = float(np.mean(np.abs(ref) ** 2))
    p_err = float(np.mean(np.abs(err) ** 2))
    if p_err == 0.0:
        return float("inf")
    return 10.0 * np.log10(p_sig / p_err)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy e2e/integration tests (deselect with -m 'not slow')")
