#!/bin/bash
# One-command hardware re-measure (slope-timed round-3 harness). Runs
# the driver metric, the all-preset sweep, and the round-3 coding-tier
# probes; results land in bench/hw_refresh_<ts>.log for BASELINE.
set -x
ts=$(date +%Y%m%d_%H%M%S)
log=bench/hw_refresh_${ts}.log
{
  echo "== probe =="
  timeout 120 python -c "import jax; print(jax.devices())" || exit 1
  echo "== bench.py (driver metric) =="
  timeout 2400 python bench.py
  echo "== all presets =="
  timeout 7200 python bench/run.py all
  echo "== config-2 bf16 serving tier (round 4) =="
  timeout 2400 python bench/run.py config2_onchip_bf16
  echo "== Pallas LDPC (edge kernel, bit-exact vs CPU tier) =="
  timeout 1800 python bench/ldpc_onchip.py --kernel --batch 16384
  echo "== Pallas QC layered kernel (round 4) =="
  timeout 2400 python bench/ldpc_onchip.py --qc --batch 4096
  echo "== on-chip turbo max-log BCJR =="
  timeout 2400 python bench/turbo_onchip.py --batch 1024
  echo "== on-chip polar SC + one-hot SCL (+fast rate-0/REP) =="
  # SC serving batch is now 32768 (metric key changed from the
  # b4096 rows — BASELINE round-4 note); 8x work needs the bigger budget
  timeout 2400 python bench/polar_onchip.py
  timeout 2400 python bench/polar_onchip.py --batch 1024 --scl 8
  timeout 2400 python bench/polar_onchip.py --batch 1024 --scl 8 --fast
  echo "== end-to-end coded link =="
  timeout 2400 python bench/coded_link_onchip.py
  echo "== config-4 ctaps vs runtime-mix A/B (round 4) =="
  timeout 2400 python bench/ab_fsk_ctaps.py 24 10
  echo "== tracking loops on-chip (round 4) =="
  timeout 1800 python bench/tracking_onchip.py fsk 8 4
  timeout 1800 python bench/tracking_onchip.py psk 8 4
  echo "== round 5: coherent coded modem e2e =="
  timeout 2400 python bench/modem_onchip.py
  timeout 2400 python bench/modem_onchip.py --order 64 --snr-db 19
  echo "== round 5: Pallas BCJR turbo (b_tile sweet spot) =="
  timeout 2400 python bench/turbo_onchip.py --layout pallas --batch 2048 --b-tile 1024
  echo "== round 5: pre-framed serving A/Bs (config-1 + config-4) =="
  timeout 2400 python bench/ab_preframed.py 25 --bf16
  timeout 2400 python bench/ab_fsk_preframed.py 22 10
  echo "== round 5: feedforward block-parallel tracker =="
  timeout 1800 python bench/tracking_onchip.py ffpsk 8 8
  timeout 1800 python bench/tracking_onchip.py ffragged 8 8
  timeout 1800 python bench/fec_onchip.py bch --batch 4096
  timeout 1800 python bench/gps_onchip.py
  timeout 1800 python bench/ofdm_onchip.py --bf16
  timeout 2400 python bench/ofdm_modem_onchip.py --snr-db 15 --pilots 4
  timeout 1800 python bench/scfde_onchip.py --bf16
  echo "== round 5: config-2 pre-framed (transfer #3) =="
  timeout 2400 python bench/ab_resample_preframed.py 25 --bf16 --out-tile 2304
  timeout 2400 python bench/run.py config2_onchip_preframed
  echo "== round 5 late: CSS serving tier + ingest e2e =="
  timeout 1800 python bench/css_onchip.py --syms 65536
  timeout 1800 python bench/css_onchip.py --syms 65536 --bf16
  timeout 1800 python bench/css_onchip.py --sf 11 --syms 8192 --bf16
  timeout 1800 python bench/css_modem_onchip.py --bf16
  timeout 1800 python bench/ingest_e2e.py
  timeout 1800 python bench/fresh_onchip.py --log2 22
  timeout 1800 python bench/fresh_onchip.py --log2 22 --bf16
} 2>&1 | tee "$log"
