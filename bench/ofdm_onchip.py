"""On-chip probe: the plane-form OFDM receiver (chains/ofdm_planes.py)
at serving call sizes — CP strip + active-bin DFT matmul + one-tap EQ +
DD common-phase + Gray slice, decisions gated against the CPU run of
the same graph, slope-timed.

    python bench/ofdm_onchip.py [--channels 8] [--nsym 16384]
        [--order 16] [--bf16]
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
    ap.add_argument("--channels", type=int, default=8)
    ap.add_argument("--nsym", type=int, default=16384)
    ap.add_argument("--order", type=int, default=16)
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from srcdsp_tpu.chains.ofdm import (make_ofdm_spec, ofdm_modulate,
                                        sym_len)
    from srcdsp_tpu.chains.ofdm_planes import make_ofdm_rx_planes
    from srcdsp_tpu.chains.qam import qam_constellation

    spec = make_ofdm_spec(nfft=64, cp=16, n_active=52, order=args.order)
    c, nsym = args.channels, args.nsym
    na = spec.active.size
    rng = np.random.default_rng(0)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        pts = np.asarray(qam_constellation(args.order))
        pilot = pts[rng.integers(0, args.order, na)]
        data_idx = rng.integers(0, args.order, (c, nsym, na))
        y = []
        for ch in range(c):
            points = np.concatenate([pilot[None], pts[data_idx[ch]]],
                                    axis=0)
            tx = np.asarray(ofdm_modulate(spec, jnp.asarray(points)))
            hch = np.array([1.0, 0.2 * np.exp(1j * 0.5)])
            rx = np.convolve(tx, hch)[: tx.size]
            rx = rx + 0.01 * (rng.standard_normal(rx.size)
                              + 1j * rng.standard_normal(rx.size))
            y.append(rx.astype(np.complex64))
        y = np.stack(y)
    k = (y.shape[-1] // sym_len(spec)) * sym_len(spec)
    yr = np.ascontiguousarray(y.real[:, :k]).astype(np.float32)
    yi = np.ascontiguousarray(y.imag[:, :k]).astype(np.float32)
    prec = (jax.lax.Precision.DEFAULT if args.bf16
            else jax.lax.Precision.HIGHEST)
    fn = jax.jit(make_ofdm_rx_planes(spec, precision=prec))
    pr = jnp.asarray(pilot.real.astype(np.float32))
    pi = jnp.asarray(pilot.imag.astype(np.float32))

    args_c = (jax.device_put(jnp.asarray(yr), cpu),
              jax.device_put(jnp.asarray(yi), cpu),
              jax.device_put(pr, cpu), jax.device_put(pi, cpu))
    idx_cpu = np.asarray(fn(*args_c)[0])
    tpu = jax.devices()[0]
    args_t = (jax.device_put(jnp.asarray(yr), tpu),
              jax.device_put(jnp.asarray(yi), tpu),
              jax.device_put(pr, tpu), jax.device_put(pi, tpu))
    idx_tpu = np.asarray(fn(*args_t)[0])
    match = bool(np.array_equal(idx_cpu, idx_tpu))
    ser = float(np.mean(idx_tpu != data_idx[:, : idx_tpu.shape[1]]))

    def region(kc):
        t0 = time.perf_counter()
        out = None
        for _ in range(kc):
            out = fn(*args_t)
        np.asarray(out[0][:1, :1, :1])
        return time.perf_counter() - t0

    from slope import calibrated_slope
    sec, _k = calibrated_slope(region, trials=5)
    n_samp = c * k
    print(json.dumps({
        "probe": "ofdm_rx_onchip", "channels": c, "nsym": nsym,
        "order": args.order, "bf16": args.bf16,
        "samples_per_call": n_samp,
        "decisions_match_cpu": match, "ser": ser,
        "ms_per_call": round(sec * 1e3, 3) if sec else None,
        "agg_msamples_per_s": round(n_samp / sec / 1e6, 1) if sec else None,
        "msymbols_per_s": round(c * (k // sym_len(spec) - 1) * na
                                / sec / 1e6, 1) if sec else None,
        "backend": jax.default_backend(),
    }), flush=True)


if __name__ == "__main__":
    main()
