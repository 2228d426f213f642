"""Interleaved A/B: runtime-mix fused FSK kernel (kernels/fsk_fused) vs
the complex-taps form (kernels/fsk_ctaps) that eliminates the per-sample
NCO mix — the VPU-dominant term in the round-3 config-1 roofline
attribution — at the cost of one extra Gauss matmul pass per band.

Correctness gates before timing: discriminator outputs allclose on the
noise buffer (reassociated math — not bit-identical by construction) and
bits IDENTICAL on a modulated FSK fixture through both wrappers.

Usage: python bench/ab_fsk_ctaps.py [n_log2_per_ch] [channels] [f32]
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _force(y):
    leaf = jax.tree_util.tree_leaves(y)[0]
    try:
        return np.asarray(leaf[tuple(slice(0, 1) for _ in leaf.shape)])
    except Exception:
        return np.asarray(leaf)


def _median_ab(fa, fb, args_a, args_b, iters=None, trials=7):
    """Interleaved SLOPE medians with CALIBRATED region length (see
    bench/slope.py): each trial times k and 2k dispatches per arm, both
    force-drained; the fixed enqueue+sync cost cancels in the
    difference, and k is sized so the difference dominates the jitter."""
    import numpy as _np

    def region(f, args, k):
        t0 = time.perf_counter()
        y = None
        for _ in range(k):
            y = f(*args)
        _force(y)
        return time.perf_counter() - t0

    if iters is None:
        est = max((region(fa, args_a, 8) - region(fa, args_a, 4)) / 4.0,
                  1e-5)
        iters = int(min(96, max(3, _np.ceil(0.08 / est))))
    ta, tb = [], []
    for _ in range(trials):
        for f, args, t in ((fa, args_a, ta), (fb, args_b, tb)):
            t1 = region(f, args, iters)
            t2 = region(f, args, 2 * iters)
            t.append((t2 - t1) / iters)
    return statistics.median(ta), statistics.median(tb)


def main(n_log2=24, channels=10, f32=False):
    from srcdsp_tpu.kernels.fsk_ctaps import (fsk_demod_ctaps,
                                              make_fsk_ctaps_kernel)
    from srcdsp_tpu.kernels.fsk_fused import (fsk_demod_fused,
                                              make_fsk_mc_kernel)
    from srcdsp_tpu.ops.nco import freq_to_word
    from srcdsp_tpu.ops.window import lowpass
    from srcdsp_tpu.testing.signals import fsk_baseband, random_bits, tone

    decim, sps = 4, 8
    taps = lowpass(64, 0.03)
    prec = jax.lax.Precision.HIGHEST if f32 else jax.lax.Precision.DEFAULT
    centers = [-0.05 - 0.01 * c for c in range(channels)]
    words = np.asarray([int(freq_to_word(c)) % (1 << 32) for c in centers],
                       np.uint32)
    fm, hist = make_fsk_mc_kernel(taps, decim, channels, sps, out_tile=512,
                                  b_rows=32, precision=prec,
                                  class_major=True)
    fc, _ = make_fsk_ctaps_kernel(taps, words, decim, sps, out_tile=512,
                                  b_rows=32, precision=prec,
                                  class_major=True)
    blk = 32 * 512 * decim
    words0 = np.asarray([(-hist * int(w)) % (1 << 32) for w in words],
                        np.uint32)
    w0 = jnp.asarray(words0.view(np.int32).reshape(-1, 1))
    dw = jnp.asarray(words.view(np.int32).reshape(-1, 1))

    # --- correctness gate: modulated fixture through the full wrappers ---
    # (complex64 fixture math must run on the CPU backend: axon has none)
    nsym = 4096
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        bits = random_bits(jax.random.PRNGKey(0), (channels, nsym))
        bb = np.asarray(fsk_baseband(bits, decim * sps, 0.05 / decim))
        x = bb * np.stack([np.asarray(tone(bb.shape[-1], -c))
                           for c in centers])
    nfix = (x.shape[-1] // blk) * blk
    xpad = np.concatenate([np.zeros((channels, hist), np.complex64),
                           x[:, :nfix]], axis=1)
    pfix = jax.device_put(jnp.asarray(
        np.stack([xpad.real, xpad.imag], axis=1).astype(np.float32)))
    _, (bits_m, soft_m) = jax.jit(lambda p: fsk_demod_fused(
        fm, hist, 512, words0, words, p, sps, class_major=True))(pfix)
    _, (bits_c, soft_c) = jax.jit(lambda p: fsk_demod_ctaps(
        fc, hist, 512, p, sps, class_major=True))(pfix)
    bits_m, bits_c = np.asarray(bits_m), np.asarray(bits_c)
    agree = float(np.mean(bits_m == bits_c))
    print(f"modulated-fixture bit agreement: {agree}", flush=True)
    assert agree == 1.0, "bits differ on the modulated fixture"
    np.testing.assert_allclose(np.asarray(soft_c), np.asarray(soft_m),
                               atol=2e-2 if not f32 else 1e-4)
    print("wrapper outputs agree on hardware", flush=True)

    # --- timing on the serving-size noise buffer ---
    n = ((1 << n_log2) // blk) * blk
    rng = np.random.default_rng(0)
    planes = jax.device_put(jnp.asarray(
        rng.standard_normal((channels, 2, hist + n)).astype(np.float32)))
    jm = jax.jit(fm)
    jc = jax.jit(fc)
    _force(jm(w0, dw, planes))
    print("fused compiled", flush=True)
    _force(jc(planes))
    print("ctaps compiled", flush=True)
    tm, tc = _median_ab(jm, jc, (w0, dw, planes), (planes,))
    rec = {
        "config": "config4_kernel_ctaps_ab", "n_per_ch": n,
        "channels": channels, "precision": "f32" if f32 else "bf16",
        "fused_agg_msps": round(channels * n / tm / 1e6, 1),
        "ctaps_agg_msps": round(channels * n / tc / 1e6, 1),
        "fused_ms": round(tm * 1e3, 3), "ctaps_ms": round(tc * 1e3, 3),
        "speedup": round(tm / tc, 3),
    }
    if not f32:
        # bf16-INGEST arm: x shipped as bf16 (halved input HBM + window
        # copies); bits gate on the modulated fixture first
        fb, _ = make_fsk_ctaps_kernel(taps, words, decim, sps, out_tile=512,
                                      b_rows=32, precision=prec,
                                      class_major=True,
                                      in_dtype=jnp.bfloat16)
        _, (bits_b16, _s) = jax.jit(lambda p: fsk_demod_ctaps(
            fb, hist, 512, p, sps, class_major=True))(
                pfix.astype(jnp.bfloat16))
        agree16 = float(np.mean(np.asarray(bits_b16) == bits_c))
        rec["bf16io_bit_agreement"] = agree16
        pb16 = planes.astype(jnp.bfloat16)
        jb = jax.jit(fb)
        _force(jb(pb16))
        print("ctaps bf16io compiled", flush=True)
        tc2, tb = _median_ab(jc, jb, (planes,), (pb16,))
        rec["ctaps_bf16io_agg_msps"] = round(channels * n / tb / 1e6, 1)
        rec["ctaps_bf16io_ms"] = round(tb * 1e3, 3)
        # ratio from ITS OWN interleave (tc2), not the first A/B's tc
        rec["bf16io_speedup_vs_ctaps"] = round(tc2 / tb, 3)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    channels = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    f32 = len(sys.argv) > 3 and sys.argv[3] == "f32"
    print("backend:", jax.default_backend(), flush=True)
    main(n_log2, channels, f32)
