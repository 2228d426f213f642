"""Benchmark CLI: one JSON line for the driver (SURVEY.md §6).

Workload: BASELINE.json config 1 on the fused plane-form front-end —
NCO mix + 64-tap FIR + 2x decimate over a 1M-sample float32 IQ buffer —
the framework's hot path, on the real TPU chip when available.

vs_baseline: the reference publishes no numbers (BASELINE.json
`published: {}`); the denominator is the driver-defined north-star target
of 1 Gsample/s aggregate on 8 chips = 125 Msamples/s/chip.
"""

import json
import sys
import time

import numpy as np

TARGET_MS_PER_CHIP = 125.0  # Msamples/s/chip <- 1 Gs/s / 8 chips north star


def main() -> None:
    import jax
    import jax.numpy as jnp

    platform = jax.default_backend()
    from srcdsp_tpu.ops.nco import freq_to_word
    from srcdsp_tpu.ops.planes import (
        fused_mix_fir_decim_planes, phase_coef_matrix, plane_hist_len,
    )
    from srcdsp_tpu.ops.window import lowpass

    t, m, n = 64, 2, 1 << 20
    taps = lowpass(t, 0.2)
    coef = jax.device_put(jnp.asarray(phase_coef_matrix(taps, m)))
    word = freq_to_word(0.11)
    h = plane_hist_len(t, m)
    word0 = jnp.asarray((-h * int(word)) % (1 << 32), jnp.uint32)

    rng = np.random.default_rng(0)
    xr = jax.device_put(jnp.asarray(rng.standard_normal((1, h + n)), jnp.float32))
    xi = jax.device_put(jnp.asarray(rng.standard_normal((1, h + n)), jnp.float32))

    step = jax.jit(lambda r, i: fused_mix_fir_decim_planes(
        coef, word0, word, r, i, m))

    y = step(xr, xi)
    jax.block_until_ready(y)  # compile + warm

    iters = 20
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = step(xr, xi)
        jax.block_until_ready(y)
        dt = (time.perf_counter() - t0) / iters
        best = min(best, dt)

    ms_per_s = n / best / 1e6
    print(json.dumps({
        "metric": f"config1_fused_mix_fir_decim_throughput_{platform}",
        "value": round(ms_per_s, 2),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(ms_per_s / TARGET_MS_PER_CHIP, 4),
    }))


if __name__ == "__main__":
    main()
