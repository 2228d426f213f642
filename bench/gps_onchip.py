"""On-chip probe: GPS C/A 2-D acquisition in plane form (X56's serving
tier) — the [D*NB, N] @ [N, N] real matmuls on the axon TPU, peak cell
gated against the CPU run of the same graph, slope-timed searches/s.

    python bench/gps_onchip.py [--prn 7] [--nb 8] [--bins 10] [--sps 2]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prn", type=int, default=7)
    ap.add_argument("--nb", type=int, default=8)
    ap.add_argument("--bins", type=int, default=10)
    ap.add_argument("--sps", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from srcdsp_tpu.chains.gps import (acquire_ca_planes, ca_code,
                                       make_gps_acq, sample_ca)

    acq = make_gps_acq(args.prn, sps=args.sps)
    n, nb = acq.n, args.nb
    rng = np.random.default_rng(0)
    true_p = 911 % n
    base = np.roll(sample_ca(ca_code(args.prn), args.sps), true_p)
    chips = np.tile(base, nb)
    t = np.arange(nb * n)
    truef = 3.0 / (2 * n)
    x = chips * np.exp(2j * np.pi * truef * t)
    x = (x + np.sqrt(20.0) * (rng.standard_normal(x.shape)
                              + 1j * rng.standard_normal(x.shape)))
    xr = np.ascontiguousarray(x.real).astype(np.float32)
    xi = np.ascontiguousarray(x.imag).astype(np.float32)
    dop = np.arange(-args.bins, args.bins + 1) / (2.0 * n)

    fn = jax.jit(lambda a, b: acquire_ca_planes(acq, a, b, dop))
    cpu = jax.local_devices(backend="cpu")[0]
    args_c = (jax.device_put(jnp.asarray(xr), cpu),
              jax.device_put(jnp.asarray(xi), cpu))
    res_c = fn(*args_c)
    tpu = jax.devices()[0]
    args_t = (jax.device_put(jnp.asarray(xr), tpu),
              jax.device_put(jnp.asarray(xi), tpu))
    res_t = fn(*args_t)
    cell_match = (int(res_t["p_idx"]) == int(res_c["p_idx"])
                  and int(res_t["d_idx"]) == int(res_c["d_idx"]))
    found = int(res_t["p_idx"]) == true_p

    def region(k):
        t0 = time.perf_counter()
        y = None
        for _ in range(k):
            y = fn(*args_t)
        np.asarray(y["metric"][:1, :1])
        return time.perf_counter() - t0

    from slope import calibrated_slope
    sec, _k = calibrated_slope(region, trials=5)
    d = 2 * args.bins + 1
    flops = 2 * 2 * d * nb * n * n
    print(json.dumps({
        "probe": "gps_acquisition_onchip", "prn": args.prn,
        "n": n, "blocks_ms": nb, "doppler_bins": d,
        "peak_cell_matches_cpu": bool(cell_match),
        "found_true_phase": bool(found),
        "ratio": round(float(res_t["ratio"]), 2),
        "ms_per_search": round(sec * 1e3, 3) if sec else None,
        "searches_per_s": round(1.0 / sec, 1) if sec else None,
        "gflops_per_s": round(flops / sec / 1e9, 1) if sec else None,
        "backend": jax.default_backend(),
    }), flush=True)


if __name__ == "__main__":
    main()
