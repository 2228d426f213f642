"""Interleaved A/B: fused FSK ctaps kernel vs the producer-pre-framed
form (config-4 transfer of the confirmed window-copy result —
kernels/fsk_preframed.py docstring).

Gates before timing: bits IDENTICAL on a modulated multichannel FSK
fixture through both demod wrappers. Legs:
  A  fsk_ctaps (windows in-kernel; the round-4 config-4 serving winner)
  B  fsk_preframed (frames prepared outside timing — producer-framed
     steady state)

    python bench/ab_fsk_preframed.py [log2_per_ch] [channels] [--f32]
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
    ap.add_argument("log2", nargs="?", type=int, default=22)
    ap.add_argument("channels", nargs="?", type=int, default=10)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from srcdsp_tpu.kernels.fsk_ctaps import (fsk_demod_ctaps,
                                              make_fsk_ctaps_kernel)
    from srcdsp_tpu.kernels.fsk_preframed import (fsk_demod_preframed,
                                                  make_fsk_preframed_kernel)
    from srcdsp_tpu.kernels.mixfir_preframed import frame_planes
    from srcdsp_tpu.ops.nco import freq_to_word
    from srcdsp_tpu.ops.window import lowpass
    from srcdsp_tpu.testing.signals import fsk_baseband, tone

    on_cpu = args.platform == "cpu"
    cch, decim, sps = args.channels, 4, 8
    out_tile, b_rows = (128, 2) if on_cpu else (512, 32)
    if on_cpu:
        args.log2 = min(args.log2, 18)
    prec = (jax.lax.Precision.HIGHEST if args.f32
            else jax.lax.Precision.DEFAULT)
    taps = lowpass(64, 0.03)
    centers = [0.05 + 0.01 * c for c in range(cch)]
    words = np.asarray([freq_to_word(-c) for c in centers], np.uint32)

    ka, hist = make_fsk_ctaps_kernel(
        taps, words, decim, sps, out_tile=out_tile, b_rows=b_rows,
        precision=prec, class_major=not on_cpu, interpret=on_cpu)
    kb, _, stride, span = make_fsk_preframed_kernel(
        taps, words, decim, sps, out_tile=out_tile, b_rows=b_rows,
        precision=prec, class_major=not on_cpu, interpret=on_cpu)
    blk = b_rows * stride
    n = ((1 << args.log2) // blk) * blk

    # modulated fixture (bits gate) — complex math pinned to CPU
    cpu = jax.devices("cpu")[0]
    rng = np.random.default_rng(0)
    nsym = n // (decim * sps)
    bits_tx = rng.integers(0, 2, (cch, nsym))
    with jax.default_device(cpu):
        bb = fsk_baseband(jnp.asarray(bits_tx), decim * sps, 0.05 / decim)
        x = np.stack([np.asarray(bb[c] * tone(bb.shape[-1], centers[c]))
                      for c in range(cch)])
    x = x + 0.02 * (rng.standard_normal(x.shape)
                    + 1j * rng.standard_normal(x.shape))
    planes = np.zeros((cch, 2, hist + n), np.float32)
    planes[:, 0, hist:] = x[:, :n].real
    planes[:, 1, hist:] = x[:, :n].imag
    xp = jax.device_put(jnp.asarray(planes))
    fr = jax.block_until_ready(
        jax.jit(lambda p: frame_planes(p, stride, span))(xp))
    xr_f = jax.device_put(fr[:, 0])
    xi_f = jax.device_put(fr[:, 1])

    step_a = jax.jit(lambda p: fsk_demod_ctaps(
        ka, hist, out_tile, p, sps, class_major=not on_cpu)[1])
    step_b = jax.jit(lambda a, b: fsk_demod_preframed(
        kb, out_tile, a, b, sps, class_major=not on_cpu)[1])
    bits_a, _ = step_a(xp)
    bits_b, _ = step_b(xr_f, xi_f)
    same = bool(np.array_equal(np.asarray(bits_a), np.asarray(bits_b)))
    out = {"probe": "ab_fsk_preframed", "channels": cch,
           "n_per_ch": n, "f32": args.f32, "bits_identical": same}
    if on_cpu or not same:
        print(json.dumps(out))
        return

    def region(fn, fargs):
        def r(k):
            t0 = time.perf_counter()
            y = None
            for _ in range(k):
                y = fn(*fargs)
            np.asarray(y[0][:1, :1])
            return time.perf_counter() - t0
        return r

    legs = {"fused": region(step_a, (xp,)),
            "preframed": region(step_b, (xr_f, xi_f))}
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
    for name, med in meds.items():
        out[f"{name}_ms"] = med * 1e3
        out[f"{name}_agg_gsps"] = cch * n / med / 1e9
    out["kk"] = ks
    out["speedup"] = meds["fused"] / meds["preframed"]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
