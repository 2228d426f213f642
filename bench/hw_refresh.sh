#!/bin/bash
# One-command hardware re-measure for when the axon tunnel recovers
# (it was down >16h at round-2 close — see BASELINE.md). Runs the
# driver metric, the all-preset sweep, and the new on-chip LDPC probe;
# results land in bench/hw_refresh_<ts>.log for BASELINE.
set -x
ts=$(date +%Y%m%d_%H%M%S)
log=bench/hw_refresh_${ts}.log
{
  echo "== probe =="
  timeout 120 python -c "import jax; print(jax.devices())" || exit 1
  echo "== bench.py (driver metric) =="
  timeout 1800 python bench.py
  echo "== all presets =="
  timeout 5400 python bench/run.py all
  echo "== on-chip LDPC (unrolled min-sum) =="
  timeout 1800 python bench/ldpc_onchip.py
  echo "== on-chip polar SC =="
  timeout 1800 python bench/polar_onchip.py
} 2>&1 | tee "$log"
