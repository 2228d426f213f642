"""Interleaved A/B: fused combined-taps mix+resample kernel (the
config-2 serving baseline) vs the producer-pre-framed complex-taps
kernel (`kernels/resample_preframed.py` — round-5 transfer #3 of the
config-1 window-copy result).

Legs (interleaved slope medians, identical stream content):
  A  fused make_mix_resample_kernel (windows + per-element mix in-kernel)
  B  preframed pure-matmul kernel (frames prepared once outside timing —
     the steady-state rate when the producer emits frames)
  F  the on-chip frame kernel alone (isolated window cost at this
     shape: span/stride duplication is hist/stride = 256/512 = 50% at
     out_tile 384, 25% at 768 — steeper than config-1's 6-12%)

Correctness gate before timing: preframed output within >=100 dB of
the fused f32-HIGHEST leg (ops are reordered, so bit-identity is not
expected — unlike the config-1/4 A/Bs where both legs share the exact
ctaps math).

    python bench/ab_resample_preframed.py [log2_samples] [--bf16]
        [--out-tile 768] [--trials 5]
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


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("log2", nargs="?", type=int, default=25)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--out-tile", type=int, default=768)
    ap.add_argument("--b-rows", type=int, default=32)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from srcdsp_tpu.kernels.mixfir_preframed import (frame_planes,
                                                     make_frame_kernel)
    from srcdsp_tpu.kernels.resample_pallas import (
        combine_fir_resample_taps, make_mix_resample_kernel,
        mix_resample_pallas)
    from srcdsp_tpu.kernels.resample_preframed import (
        make_resample_preframed_kernel)
    from srcdsp_tpu.ops.nco import freq_to_word
    from srcdsp_tpu.ops.window import lowpass

    on_cpu = args.platform == "cpu"
    up, down = 3, 4
    out_tile, b_rows, block_cols = args.out_tile, args.b_rows, 192
    if on_cpu:
        # hist=256 at the config-2 taps -> need hist | stride, so the
        # smallest interpret geometry is out_tile=192 (stride=256)
        out_tile, b_rows, block_cols = 192, 2, 48
        args.log2 = min(args.log2, 19)
    n = 1 << args.log2
    hc = combine_fir_resample_taps(lowpass(128, 0.2), lowpass(48, 0.3),
                                   up=up)
    word = int(freq_to_word(0.07))
    prec = (jax.lax.Precision.DEFAULT if args.bf16
            else jax.lax.Precision.HIGHEST)
    dt = jnp.bfloat16 if args.bf16 else jnp.float32

    # leg A: the serving baseline (config-2 preset geometry ot=384/bc=192,
    # f32 planes in; bf16 == precision-only, matching run_config2_onchip)
    ka = make_mix_resample_kernel(hc, up=up, down=down, out_tile=384,
                                  b_rows=24, block_cols=192,
                                  precision=prec, interpret=on_cpu) \
        if not on_cpu else \
        make_mix_resample_kernel(hc, up=up, down=down, out_tile=out_tile,
                                 b_rows=b_rows, block_cols=block_cols,
                                 precision=prec, interpret=True)
    fn_b, hist, stride, span = make_resample_preframed_kernel(
        hc, word, up, down, out_tile=out_tile, b_rows=b_rows,
        block_cols=block_cols, precision=prec, in_dtype=dt,
        interpret=on_cpu)
    assert ka.hist == hist
    lcm_in = np.lcm(ka.block_in(), b_rows * stride)
    n = max(1, n // int(lcm_in)) * int(lcm_in)
    fk = make_frame_kernel(stride, span, b_rows=b_rows, in_dtype=dt,
                           interpret=on_cpu)

    rng = np.random.default_rng(0)
    planes = rng.standard_normal((2, hist + n)).astype(np.float32)
    word0 = (-hist * word) % (1 << 32)
    x = jax.device_put(jnp.asarray(planes))
    step_a = jax.jit(lambda p: mix_resample_pallas(ka, word0, word, p))
    frames = jax.block_until_ready(
        jax.jit(lambda p: frame_planes(p, stride, span).astype(dt))(x))
    xr_f, xi_f = frames[0], frames[1]
    w0 = jnp.asarray(np.asarray([[word0]], np.uint32).view(np.int32))
    step_b = jax.jit(fn_b)
    step_f = jax.jit(lambda p: fk(p.astype(dt)))

    # --- correctness gate: SNR of preframed vs fused on this stream ---
    yr_a, yi_a = step_a(x)
    yr_b, yi_b = step_b(w0, xr_f, xi_f)
    ref = np.asarray(yr_a).ravel() + 1j * np.asarray(yi_a).ravel()
    got = np.asarray(yr_b).ravel() + 1j * np.asarray(yi_b).ravel()
    err = got - ref
    snr = 10 * np.log10(float(np.mean(np.abs(ref) ** 2))
                        / max(float(np.mean(np.abs(err) ** 2)), 1e-300))
    bar = 40.0 if args.bf16 else 100.0
    out = {"probe": "ab_resample_preframed", "n": n, "bf16": args.bf16,
           "out_tile": out_tile, "snr_vs_fused_db": round(snr, 1),
           "dup_frac": round(hist / stride, 3), "gate_ok": bool(snr > bar)}
    if not out["gate_ok"]:
        print(json.dumps(out), flush=True)
        sys.exit(1)
    if on_cpu:
        print(json.dumps(out), flush=True)
        return

    def region(fn):
        def r(kc):
            t0 = time.perf_counter()
            y = None
            for _ in range(kc):
                y = fn()
            np.asarray(jax.tree_util.tree_leaves(y)[0][:1, :1])
            return time.perf_counter() - t0
        return r

    legs = {"fused": region(lambda: step_a(x)),
            "preframed": region(lambda: step_b(w0, xr_f, xi_f)),
            "frame_only": region(lambda: step_f(x))}
    ks = {}
    for name, r in legs.items():
        r(1)
        est = max((r(16) - r(8)) / 8.0, 1e-5)
        ks[name] = int(min(384, max(4, np.ceil(0.08 / est))))
    slopes = {name: [] for name in legs}
    for _ in range(args.trials):
        for name, r in legs.items():
            k = ks[name]
            t1 = r(k)
            t2 = r(2 * k)
            slopes[name].append((t2 - t1) / k)
    meds = {name: float(np.median(v)) for name, v in slopes.items()}
    out["kk"] = ks
    for name, med in meds.items():
        if med > 0:
            out[f"{name}_ms"] = round(med * 1e3, 3)
            out[f"{name}_gsps"] = round(n / med / 1e9, 2)
    if meds["fused"] > 0 and meds["preframed"] > 0:
        out["speedup_preframed_vs_fused"] = round(
            meds["fused"] / meds["preframed"], 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
