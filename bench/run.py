"""Benchmark/profiling CLI (SURVEY.md §5, C12): run a named config preset.

    python bench/run.py config1 [--pallas] [--iters 20] [--profile DIR]

Prints one JSON metrics line per run (Msamples/s, plus cost-analysis FLOPs
when available). `bench.py` at the repo root remains the driver's one-line
entry; this CLI is the human-facing harness over all five presets.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def run_config(name: str, use_pallas: bool = False, iters: int = 20,
               profile_dir: str | None = None, **kw) -> dict:
    import jax
    from srcdsp_tpu.configs import CONFIGS

    spec = CONFIGS[name]
    if name == "config1":
        built = spec.build(use_pallas=use_pallas, **kw)
    else:
        built = spec.build(**kw)
    step, args = built.step, built.example

    out = step(*args)
    jax.block_until_ready(out)

    if profile_dir:
        with jax.profiler.trace(profile_dir):
            out = step(*args)
            jax.block_until_ready(out)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)

    msps = built.samples_per_call / best / 1e6
    rec = {
        "config": name,
        "platform": jax.default_backend(),
        "msamples_per_s": round(msps, 2),
        "ms_per_iter": round(best * 1e3, 3),
        "samples_per_call": built.samples_per_call,
        "impl": built.meta.get("impl"),
    }
    try:
        lowered = jax.jit(step).lower(*args)
        cost = lowered.compile().cost_analysis()
        if cost and "flops" in cost:
            rec["gflops_per_s"] = round(cost["flops"] / best / 1e9, 1)
    except Exception:
        pass
    return rec


def run_fft(iters: int = 20, n: int = 4096, batch: int = 256) -> dict:
    """FFT GFLOP/s (BASELINE.json metric) via the MXU four-step transform."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    from srcdsp_tpu.ops.fft_planes import fft_planes_flops, make_fft_planes

    fft = jax.jit(make_fft_planes(n))
    rng = np.random.default_rng(0)
    xr = jax.device_put(jnp.asarray(rng.standard_normal((batch, n)), jnp.float32))
    xi = jax.device_put(jnp.asarray(rng.standard_normal((batch, n)), jnp.float32))
    y = fft(xr, xi)
    jax.block_until_ready(y)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fft(xr, xi)
        jax.block_until_ready(y)
        best = min(best, (time.perf_counter() - t0) / iters)
    return {
        "config": "fft",
        "platform": jax.default_backend(),
        "fft_size": n,
        "batch": batch,
        "ms_per_iter": round(best * 1e3, 3),
        "gflops_per_s_matmul": round(fft_planes_flops(batch, n) / best / 1e9, 1),
        "gflops_per_s_5nlogn": round(5 * n * np.log2(n) * batch / best / 1e9, 1),
    }


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config", choices=["config1", "config2", "config3",
                                      "config4", "config5", "fft", "all"])
    p.add_argument("--pallas", action="store_true",
                   help="use the Pallas fused kernel (config1)")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--profile", default=None,
                   help="write an XProf trace to this directory")
    args = p.parse_args(argv)

    names = (["config1", "config2", "config3", "config4", "config5", "fft"]
             if args.config == "all" else [args.config])
    for name in names:
        if name == "fft":
            rec = run_fft(iters=args.iters)
        else:
            rec = run_config(name, use_pallas=args.pallas, iters=args.iters,
                             profile_dir=args.profile)
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
