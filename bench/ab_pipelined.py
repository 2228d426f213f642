"""Interleaved A/B: pipelined dual-BlockSpec staging vs manual slab DMA
for the fused mix+FIR kernel (config-1 shape) and the combined-taps
mix+FIR+resample kernel (config-2 shape), on the real chip.

Bit-exactness is asserted on-device output before timing. Medians of
interleaved trials (tunnel drift makes anything else noise — see
.claude/skills/verify/SKILL.md).

Usage: python bench/ab_pipelined.py [config1|config2] [n_log2]
"""
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
    """Drain the device queue (block_until_ready no longer does on the
    tunnel backend - bench/run.py:_force)."""
    import numpy as _np
    import jax as _jax
    leaf = _jax.tree_util.tree_leaves(y)[0]
    try:
        return _np.asarray(leaf[tuple(slice(0, 1) for _ in leaf.shape)])
    except Exception:
        return _np.asarray(leaf)


def _median_ab(fa, fb, args, iters=2, trials=7):
    ta, tb = [], []
    for _ in range(trials):
        for f, t in ((fa, ta), (fb, tb)):
            t0 = time.perf_counter()
            for _ in range(iters):
                y = f(*args)
            _force(y)
            t.append((time.perf_counter() - t0) / iters)
    return statistics.median(ta), statistics.median(tb)


def ab_config1(n_log2=26):
    from srcdsp_tpu.kernels.mixfir import make_mix_fir_kernel
    from srcdsp_tpu.ops.nco import freq_to_word
    from srcdsp_tpu.ops.window import lowpass

    taps = lowpass(64, 0.2)
    word = int(freq_to_word(0.11))
    km = make_mix_fir_kernel(taps, 2, out_tile=512, b_rows=32,
                             pipelined=False)
    kp = make_mix_fir_kernel(taps, 2, out_tile=512, b_rows=32,
                             pipelined=True)
    n = ((1 << n_log2) // km.block_in()) * km.block_in()
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((2, km.hist + n)).astype(np.float32)))
    w0 = jnp.asarray(np.int32(12345)).reshape(1, 1)
    dw = jnp.asarray(np.uint32(word).view(np.int32)).reshape(1, 1)
    fm = jax.jit(km.fn)
    fp = jax.jit(kp.fn)
    ym = fm(w0, dw, x)
    _force(ym)
    print("manual compiled", flush=True)
    yp = fp(w0, dw, x)
    _force(yp)
    print("pipelined compiled", flush=True)
    for a, b in zip(ym, yp):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print("bit-identical on hardware", flush=True)
    tm, tp = _median_ab(fm, fp, (w0, dw, x))
    print(json.dumps({
        "config": "config1_kernel", "n": n,
        "manual_msps": round(n / tm / 1e6, 1),
        "pipelined_msps": round(n / tp / 1e6, 1),
        "speedup": round(tm / tp, 3),
    }), flush=True)


def ab_config2(n_log2=25):
    from srcdsp_tpu.kernels.resample_pallas import (
        combine_fir_resample_taps, make_mix_resample_kernel,
        mix_resample_pallas)
    from srcdsp_tpu.ops.nco import freq_to_word
    from srcdsp_tpu.ops.window import lowpass

    hc = combine_fir_resample_taps(lowpass(128, 0.2), lowpass(48, 0.3),
                                   up=3)
    word = int(freq_to_word(0.11))
    km = make_mix_resample_kernel(hc, up=3, down=4, out_tile=384,
                                  b_rows=24, block_cols=384,
                                  pipelined=False)
    kp = make_mix_resample_kernel(hc, up=3, down=4, out_tile=384,
                                  b_rows=24, block_cols=384,
                                  pipelined=True)
    nin = ((1 << n_log2) // km.block_in()) * km.block_in()
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((2, km.hist + nin)).astype(np.float32)))
    w0 = jnp.asarray(np.int32(999)).reshape(1, 1)
    dw = jnp.asarray(np.uint32(word).view(np.int32)).reshape(1, 1)
    fm = jax.jit(km.fn)
    fp = jax.jit(kp.fn)
    ym = fm(w0, dw, x)
    _force(ym)
    print("manual compiled", flush=True)
    yp = fp(w0, dw, x)
    _force(yp)
    print("pipelined compiled", flush=True)
    for a, b in zip(ym, yp):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print("bit-identical on hardware", flush=True)
    tm, tp = _median_ab(fm, fp, (w0, dw, x))
    print(json.dumps({
        "config": "config2_kernel", "nin": nin,
        "manual_msps": round(nin / tm / 1e6, 1),
        "pipelined_msps": round(nin / tp / 1e6, 1),
        "speedup": round(tm / tp, 3),
    }), flush=True)


def ab_config4(n_log2=22, channels=10):
    from srcdsp_tpu.kernels.fsk_fused import make_fsk_mc_kernel
    from srcdsp_tpu.ops.nco import freq_to_word
    from srcdsp_tpu.ops.window import lowpass

    decim, sps = 4, 8
    taps = lowpass(64, 0.03)
    fm, hist = make_fsk_mc_kernel(taps, decim, channels, sps, out_tile=512,
                                  b_rows=32, class_major=True,
                                  pipelined=False)
    fp, _ = make_fsk_mc_kernel(taps, decim, channels, sps, out_tile=512,
                               b_rows=32, class_major=True, pipelined=True)
    blk = 32 * 512 * decim
    n = ((1 << n_log2) // blk) * blk
    rng = np.random.default_rng(0)
    planes = jax.device_put(jnp.asarray(
        rng.standard_normal((channels, 2, hist + n)).astype(np.float32)))
    words = np.asarray([int(freq_to_word(-0.05 - 0.01 * c)) % (1 << 32)
                        for c in range(channels)], np.uint32)
    words0 = np.asarray([(-hist * int(w)) % (1 << 32) for w in words],
                        np.uint32)
    w0 = jnp.asarray(words0.view(np.int32).reshape(-1, 1))
    dw = jnp.asarray(words.view(np.int32).reshape(-1, 1))
    jm = jax.jit(fm)
    jp = jax.jit(fp)
    ym = jm(w0, dw, planes)
    _force(ym)
    print("manual compiled", flush=True)
    yp = jp(w0, dw, planes)
    _force(yp)
    print("pipelined compiled", flush=True)
    for a, b in zip(ym, yp):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print("bit-identical on hardware", flush=True)
    tm, tp = _median_ab(jm, jp, (w0, dw, planes))
    print(json.dumps({
        "config": "config4_kernel", "n_per_ch": n, "channels": channels,
        "manual_agg_msps": round(channels * n / tm / 1e6, 1),
        "pipelined_agg_msps": round(channels * n / tp / 1e6, 1),
        "speedup": round(tm / tp, 3),
    }), flush=True)


def ab_config5(frames_log2=18, m=64, b_k=512):
    from srcdsp_tpu.chains.channelizer import design_prototype
    from srcdsp_tpu.kernels.bank_pallas import make_bank_psk_kernel

    proto = design_prototype(m, taps_per_phase=8)
    km, hist_cols = make_bank_psk_kernel(proto, m, sps=4, order=4, b_k=b_k,
                                         class_major=True, pipelined=False)
    kp, _ = make_bank_psk_kernel(proto, m, sps=4, order=4, b_k=b_k,
                                 class_major=True, pipelined=True)
    k = ((1 << frames_log2) // b_k) * b_k
    rng = np.random.default_rng(0)
    xp = jax.device_put(jnp.asarray(
        rng.standard_normal((2, m, hist_cols + k)).astype(np.float32)))
    jm = jax.jit(km)
    jp = jax.jit(kp)
    ym = jm(xp)
    _force(ym)
    print("manual compiled", flush=True)
    yp = jp(xp)
    _force(yp)
    print("pipelined compiled", flush=True)
    for a, b in zip(ym, yp):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print("bit-identical on hardware", flush=True)
    tm, tp = _median_ab(jm, jp, (xp,))
    n = k * m
    print(json.dumps({
        "config": "config5_kernel", "wideband_n": n,
        "manual_msps": round(n / tm / 1e6, 1),
        "pipelined_msps": round(n / tp / 1e6, 1),
        "speedup": round(tm / tp, 3),
    }), flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "config1"
    kw = {}
    if len(sys.argv) > 2:
        key = "frames_log2" if which == "config5" else "n_log2"
        kw[key] = int(sys.argv[2])
    print("backend:", jax.default_backend(), flush=True)
    {"config1": ab_config1, "config2": ab_config2,
     "config4": ab_config4, "config5": ab_config5}[which](**kw)
