"""On-chip probe: FRESH interference excision in plane form (X68's
serving tier) — branch rotations folded into banded matrices, one MXU
matmul per conj-group + phasor epilogue (ops/fresh_planes.py). Gates:
chip output == CPU run of the same graph (allclose) AND the chip
output's SINR vs the clean target holds the FRESH gain. Slope-timed.

    python bench/fresh_onchip.py [--log2 21] [--taps 24]
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
    ap.add_argument("--log2", type=int, default=21)
    ap.add_argument("--taps", type=int, default=24)
    ap.add_argument("--bf16", action="store_true",
                    help="DEFAULT (1-pass bf16) matmul tier — gated on "
                         "SINR within 0.2 dB of the f32 complex tier")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from srcdsp_tpu.ops.fresh import (bpsk_branches, fresh_design,
                                      merge_branches)
    from srcdsp_tpu.ops.fresh_planes import make_fresh_planes
    from srcdsp_tpu.ops.window import root_raised_cosine

    rng = np.random.default_rng(0)

    def bpsk(nsym, sps, fc):
        h = root_raised_cosine(sps, 8, 0.9)
        sym = 1.0 - 2.0 * rng.integers(0, 2, nsym).astype(np.float64)
        up = np.zeros(nsym * sps)
        up[::sps] = sym
        bb = np.convolve(up, h, "same")
        return (bb * np.exp(2j * np.pi * fc * np.arange(bb.size))
                ).astype(np.complex64)

    n = 1 << args.log2
    ntr = 1 << 14
    fa, fb = 0.02, 0.035
    a = bpsk(n // 8 + 8, 8, fa)[:n]
    b = bpsk(n // 5 + 8, 5, fb)[:n]
    x = (a + b + 0.03 * (rng.standard_normal(n)
                         + 1j * rng.standard_normal(n))
         ).astype(np.complex64)

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        br = merge_branches(bpsk_branches(fa, 1 / 8),
                            bpsk_branches(fb, 1 / 5))
        f = fresh_design(jnp.asarray(x[:ntr]), jnp.asarray(a[:ntr]),
                         br, taps=args.taps, n0=0)
        f = f._replace(weights=jnp.asarray(np.asarray(f.weights)))
    taps = args.taps
    stride = 128
    prec = (jax.lax.Precision.DEFAULT if args.bf16
            else jax.lax.Precision.HIGHEST)
    raw = make_fresh_planes(f, stride=stride, precision=prec)
    fn = jax.jit(raw, static_argnums=2)

    hist = raw.hist
    nn = ((x.size - ntr - hist) // stride) * stride
    seg = x[ntr: ntr + nn + hist]
    xr = np.ascontiguousarray(seg.real[None, :]).astype(np.float32)
    xi = np.ascontiguousarray(seg.imag[None, :]).astype(np.float32)
    yr_c, yi_c = fn(jax.device_put(jnp.asarray(xr), cpu),
                    jax.device_put(jnp.asarray(xi), cpu), ntr)
    y_c = np.asarray(yr_c)[0] + 1j * np.asarray(yi_c)[0]
    tpu = jax.devices()[0]
    args_t = (jax.device_put(jnp.asarray(xr), tpu),
              jax.device_put(jnp.asarray(xi), tpu))
    yr_t, yi_t = fn(*args_t, ntr)
    y_t = np.asarray(yr_t)[0] + 1j * np.asarray(yi_t)[0]
    scale = float(np.sqrt(np.mean(np.abs(y_c) ** 2)))
    close = bool(np.allclose(y_t, y_c, atol=5e-3 * scale))

    d = a[ntr:][taps - 1 - f.delay: taps - 1 - f.delay + y_t.size]

    def sdb(y):
        return float(10 * np.log10(np.mean(np.abs(d) ** 2)
                                   / np.mean(np.abs(y - d) ** 2)))

    def region(k):
        t0 = time.perf_counter()
        yy = None
        for _ in range(k):
            yy = fn(*args_t, ntr)
        np.asarray(yy[0][:1, :1])
        return time.perf_counter() - t0

    from slope import calibrated_slope
    sec, _k = calibrated_slope(region, trials=5)
    ns = nn
    span = stride + hist
    flops = 8 * (ns // stride) * span * stride * len(br)   # dense-band matmuls
    print(json.dumps({
        "probe": "fresh_onchip", "n": ns, "taps": taps,
        "bf16": args.bf16,
        "branches": len(br),
        "chip_matches_cpu": close,
        "sinr_chip_db": round(sdb(y_t), 2),
        "sinr_cpu_db": round(sdb(y_c), 2),
        "ms_per_call": round(sec * 1e3, 3) if sec else None,
        "msps": round(ns / sec / 1e6, 1) if sec else None,
        "gflops_per_s": round(flops / sec / 1e9, 1) if sec else None,
        "backend": jax.default_backend(),
    }), flush=True)


if __name__ == "__main__":
    main()
