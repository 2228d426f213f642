"""On-chip probe: batched CSS demodulation in plane form (X64's serving
tier) — dechirp planes + fft_planes DFT matmuls + argmax-free peak on
the axon TPU, decisions gated against the CPU run of the same graph,
slope-timed chip throughput.

    python bench/css_onchip.py [--sf 8] [--syms 16384] [--snr-db -5]
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
    ap.add_argument("--sf", type=int, default=8)
    ap.add_argument("--syms", type=int, default=16384)
    ap.add_argument("--snr-db", type=float, default=-5.0)
    ap.add_argument("--form", choices=["auto", "direct", "fourstep"],
                    default="auto")
    ap.add_argument("--bf16", action="store_true",
                    help="DEFAULT (1-pass bf16) matmul precision: a "
                         "serving TIER like config-2 bf16 — gated on "
                         "truth SER, not CPU bit-identity")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from srcdsp_tpu.chains import css
    from srcdsp_tpu.chains.css_planes import make_css_demod_planes
    from srcdsp_tpu.ops.fft_planes import fft_planes_flops

    p = css.make_css_params(sf=args.sf)
    s, n = args.syms, p.n
    rng = np.random.default_rng(0)
    ks = rng.integers(0, n, s)
    x = css.css_modulate(p, ks)
    sigma = np.sqrt(10 ** (-args.snr_db / 10) / 2)
    x = (x * np.exp(1j * 0.3)
         + sigma * (rng.standard_normal(x.size)
                    + 1j * rng.standard_normal(x.size))).astype(np.complex64)
    fr = x.reshape(s, n)
    xr = np.ascontiguousarray(fr.real).astype(np.float32)
    xi = np.ascontiguousarray(fr.imag).astype(np.float32)

    prec = (jax.lax.Precision.DEFAULT if args.bf16
            else jax.lax.Precision.HIGHEST)
    direct = None if args.form == "auto" else (args.form == "direct")
    fn = jax.jit(make_css_demod_planes(p, precision=prec,
                                       direct=direct))
    cpu = jax.local_devices(backend="cpu")[0]
    k_c, _ = fn(jax.device_put(jnp.asarray(xr), cpu),
                jax.device_put(jnp.asarray(xi), cpu))
    k_c = np.asarray(k_c)
    tpu = jax.devices()[0]
    args_t = (jax.device_put(jnp.asarray(xr), tpu),
              jax.device_put(jnp.asarray(xi), tpu))
    out_t = fn(*args_t)
    k_t = np.asarray(out_t[0])
    match = bool(np.array_equal(k_t, k_c))
    ser = float(np.mean(k_c != ks))
    ser_t = float(np.mean(k_t != ks))      # the bf16 tier's real gate

    def region(k):
        t0 = time.perf_counter()
        y = None
        for _ in range(k):
            y = fn(*args_t)
        np.asarray(y[0][:1])
        return time.perf_counter() - t0

    from slope import calibrated_slope
    sec, _k = calibrated_slope(region, trials=5)
    chips = s * n
    # direct folded form: 4 real [S,N]@[N,N] matmuls; four-step
    # fallback: fft_planes count + the dechirp multiply
    used_direct = (direct if direct is not None
                   else n <= 1024 or (n <= 2048 and args.bf16))
    flops = (4 * 2 * s * n * n if used_direct
             else fft_planes_flops(s, n) + 6 * chips)
    print(json.dumps({
        "probe": "css_demod_onchip", "sf": args.sf, "syms": s,
        "chips_per_call": chips, "snr_db": args.snr_db,
        "bf16": args.bf16,
        "decisions_match_cpu": match, "cpu_ser_vs_truth": ser,
        "chip_ser_vs_truth": ser_t,
        "ms_per_call": round(sec * 1e3, 3) if sec else None,
        "msps": round(chips / sec / 1e6, 1) if sec else None,
        "gflops_per_s": round(flops / sec / 1e9, 1) if sec else None,
        "backend": jax.default_backend(),
    }), flush=True)


if __name__ == "__main__":
    main()
