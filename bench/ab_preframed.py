"""Interleaved A/B: fused ctaps kernel vs producer-pre-framed pure-
matmul kernel (config-1 framing experiment #4 — the last untried idea
after three falsifications; kernels/mixfir_preframed.py docstring).

Three timed legs, interleaved slope medians on identical input content:
  A  fused mixfir_ctaps (the serving baseline: windows in-kernel)
  B  preframed kernel alone (frames prepared once outside timing — the
     steady-state rate when the PRODUCER emits frames, e.g. host ingest)
  F  the on-chip frame kernel alone (the isolated window-copy cost)

Interpretation: B >> A means the window ops were throttling the matmul
issue (hypothesis confirmed; production fix = emit frames upstream).
B ~ A means the window ops overlap fine and the gap to HBM SOL lives
elsewhere (fourth falsification — closes the thread). B outputs are
asserted bit-identical to A before timing.

    python bench/ab_preframed.py [log2_samples] [--bf16] [--trials 5]
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
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from srcdsp_tpu.kernels.mixfir_ctaps import (make_mix_fir_ctaps_kernel,
                                                 mix_fir_ctaps_pallas)
    from srcdsp_tpu.kernels.mixfir_preframed import (
        frame_planes, make_ctaps_preframed_kernel, make_frame_kernel)
    from srcdsp_tpu.ops.nco import freq_to_word
    from srcdsp_tpu.ops.window import lowpass

    on_cpu = args.platform == "cpu"
    t, m, out_tile, b_rows = 64, 4, 512, 32
    if on_cpu:
        out_tile, b_rows = 128, 2
        args.log2 = min(args.log2, 20)
    n = 1 << args.log2
    taps = lowpass(t, 0.4 / m)
    word = int(freq_to_word(0.2183))
    prec = (jax.lax.Precision.DEFAULT if args.bf16
            else jax.lax.Precision.HIGHEST)
    dt = jnp.bfloat16 if args.bf16 else jnp.float32
    ka = make_mix_fir_ctaps_kernel(taps, word, m, out_tile=out_tile,
                                   b_rows=b_rows, precision=prec,
                                   in_dtype=dt, interpret=on_cpu)
    n -= n % ka.block_in()
    fn_b, hist, stride, span = make_ctaps_preframed_kernel(
        taps, word, m, out_tile=out_tile, b_rows=b_rows, precision=prec,
        in_dtype=dt, interpret=on_cpu)
    fk = make_frame_kernel(stride, span, b_rows=b_rows, in_dtype=dt,
                           interpret=on_cpu)

    rng = np.random.default_rng(0)
    planes = rng.standard_normal((2, hist + n)).astype(np.float32)
    word0 = (-hist * word) % (1 << 32)
    x = jax.device_put(jnp.asarray(planes).astype(dt))
    w0 = jnp.asarray(np.asarray([[word0]], np.uint32).view(np.int32))

    step_a = jax.jit(lambda p: mix_fir_ctaps_pallas(ka, word0, p))
    frames = jax.block_until_ready(
        jax.jit(lambda p: frame_planes(p, stride, span))(x))
    xr_f, xi_f = frames[0], frames[1]      # [NT, span] per plane
    step_b = jax.jit(fn_b)
    step_f = jax.jit(fk)

    # equivalence gate (bit-identical outputs before any timing)
    yr_a, yi_a = step_a(x)
    yr_b, yi_b = step_b(w0, xr_f, xi_f)
    same = (np.array_equal(np.asarray(yr_a).ravel(),
                           np.asarray(yr_b).ravel())
            and np.array_equal(np.asarray(yi_a).ravel(),
                               np.asarray(yi_b).ravel()))
    fr_k = step_f(x)
    fr_same = (np.array_equal(np.asarray(fr_k[0]), np.asarray(xr_f))
               and np.array_equal(np.asarray(fr_k[1]), np.asarray(xi_f)))

    if on_cpu:
        print(json.dumps({"probe": "ab_preframed", "n": n,
                          "bitexact": bool(same),
                          "frame_kernel_ok": bool(fr_same)}))
        return

    def region(fn, k):
        def r(kc=k):
            t0 = time.perf_counter()
            y = None
            for _ in range(kc):
                y = fn()
            np.asarray(jax.tree_util.tree_leaves(y)[0][:1, :1])
            return time.perf_counter() - t0
        return r

    legs = {"fused": region(lambda: step_a(x), 0),
            "preframed": region(lambda: step_b(w0, xr_f, xi_f), 0),
            "frame_only": region(lambda: step_f(x), 0)}
    out = {"probe": "ab_preframed", "n": n, "bf16": args.bf16,
           "bitexact": bool(same), "frame_kernel_ok": bool(fr_same)}
    # calibrate k per leg once, then INTERLEAVE the trials (tunnel
    # throughput drifts tens of percent over minutes — only interleaved
    # in-process medians are decision-grade, verify-skill round-2 note)
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
    meds = {name: (float(np.median(v)) if v else None)
            for name, v in slopes.items()}
    out["kk"] = ks
    for name, med in meds.items():
        if med:
            out[f"{name}_ms"] = med * 1e3
            out[f"{name}_gsps"] = n / med / 1e9
    if meds.get("fused") and meds.get("preframed"):
        out["speedup_preframed_vs_fused"] = meds["fused"] / meds["preframed"]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
