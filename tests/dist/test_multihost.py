"""True multi-PROCESS validation: 2 jax.distributed processes x 4 devices,
gloo cross-process collectives, the config-5 pipeline bit-exact across the
process boundary (bench/multihost_check.py). The same control plane a
2-host TPU pod uses; only the transport differs."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


@pytest.mark.slow
def test_two_process_pipeline_bit_exact():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)            # workers set their own device count
    env["SRCDSP_MH_PORT"] = "47829"       # avoid clashing with manual runs
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench", "multihost_check.py")],
        capture_output=True, text=True, timeout=540, env=env, cwd=REPO)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "BIT-EXACT across the process boundary" in out.stdout
