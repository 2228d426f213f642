"""On-chip probe: plane-form SC-FDE receiver (chains/scfde_planes.py)
at serving call sizes, decisions gated against the CPU run of the same
graph, slope-timed.

    python bench/scfde_onchip.py [--channels 8] [--blocks 4096]
        [--order 4] [--bf16]
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
    ap.add_argument("--blocks", type=int, default=4096)
    ap.add_argument("--order", type=int, default=4)
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from srcdsp_tpu.chains.qam import qam_constellation
    from srcdsp_tpu.chains.scfde import make_scfde_spec, scfde_tx
    from srcdsp_tpu.chains.scfde_planes import make_scfde_rx_planes

    c, s = args.channels, args.blocks
    rng = np.random.default_rng(0)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        # the spec's complex64 pilot must NOT land on the axon device
        # (complex transfers are unimplemented there)
        spec = make_scfde_spec(n=256, cp=32)
        pts = np.asarray(qam_constellation(args.order))
        data_idx = rng.integers(0, args.order, (c, s, spec.n))
        y = []
        for ch in range(c):
            tx = np.asarray(scfde_tx(spec, jnp.asarray(pts[data_idx[ch]])))
            hch = np.array([1.0, 0.0, 0.3 * np.exp(1j * 1.1)])
            rx = np.convolve(tx, hch)[: tx.size]
            rx = rx + 0.02 * (rng.standard_normal(rx.size)
                              + 1j * rng.standard_normal(rx.size))
            y.append(rx.astype(np.complex64))
        y = np.stack(y)
    yr = np.ascontiguousarray(y.real).astype(np.float32)
    yi = np.ascontiguousarray(y.imag).astype(np.float32)
    prec = (jax.lax.Precision.DEFAULT if args.bf16
            else jax.lax.Precision.HIGHEST)
    fn = jax.jit(make_scfde_rx_planes(spec, order=args.order, snr=200.0,
                                      precision=prec))
    args_c = (jax.device_put(jnp.asarray(yr), cpu),
              jax.device_put(jnp.asarray(yi), cpu))
    idx_cpu = np.asarray(fn(*args_c)[0])
    tpu = jax.devices()[0]
    args_t = (jax.device_put(jnp.asarray(yr), tpu),
              jax.device_put(jnp.asarray(yi), tpu))
    idx_tpu = np.asarray(fn(*args_t)[0])
    match = bool(np.array_equal(idx_cpu, idx_tpu))
    ser = float(np.mean(idx_tpu != data_idx))

    def region(kc):
        t0 = time.perf_counter()
        out = None
        for _ in range(kc):
            out = fn(*args_t)
        np.asarray(out[0][:1, :1, :1])
        return time.perf_counter() - t0

    from slope import calibrated_slope
    sec, _k = calibrated_slope(region, trials=5)
    n_samp = c * yr.shape[-1]
    print(json.dumps({
        "probe": "scfde_rx_onchip", "channels": c, "blocks": s,
        "order": args.order, "bf16": args.bf16,
        "samples_per_call": n_samp,
        "decisions_match_cpu": match, "ser": ser,
        "ms_per_call": round(sec * 1e3, 3) if sec else None,
        "agg_msamples_per_s": round(n_samp / sec / 1e6, 1) if sec else None,
        "backend": jax.default_backend(),
    }), flush=True)


if __name__ == "__main__":
    main()
