"""Interleaved slope A/B: aligned-layout complex-taps kernel
(kernels/ctaps_aligned — no window copies) vs kernels/mixfir_ctaps
(windowed) at the config-1 serving shape. Correctness gate first:
column blocks j >= 1 must be BIT-identical on hardware (same matmuls on
the same operands), block 0 allclose.

Usage: python bench/ab_ctaps_aligned.py [n_log2] [f32]
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


def main(n_log2=26, f32=False):
    from srcdsp_tpu.kernels.ctaps_aligned import make_ctaps_aligned_kernel
    from srcdsp_tpu.kernels.mixfir_ctaps import make_mix_fir_ctaps_kernel
    from srcdsp_tpu.ops.nco import freq_to_word
    from srcdsp_tpu.ops.window import lowpass

    decim = 2
    taps = lowpass(64, 0.2)
    word = int(freq_to_word(0.11))
    prec = jax.lax.Precision.HIGHEST if f32 else jax.lax.Precision.DEFAULT
    ko = make_mix_fir_ctaps_kernel(taps, word, decim, out_tile=512,
                                   b_rows=32, precision=prec)
    ka = make_ctaps_aligned_kernel(taps, word, decim, out_tile=512,
                                   b_rows=32, precision=prec)
    hist = ka.hist
    stride = 512 * decim
    n = ((1 << n_log2) // ka.block_in()) * ka.block_in()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, hist + n)).astype(np.float32)
    xj = jax.device_put(jnp.asarray(x))
    xh = jax.device_put(jnp.asarray(x[:, :hist]))
    xb = jax.device_put(jnp.asarray(x[:, hist:]))

    w0_old = jnp.asarray(
        np.uint32((-hist * word) % (1 << 32)).view(np.int32)).reshape(1, 1)
    w0_new = jnp.asarray(np.int32(0)).reshape(1, 1)

    jo = jax.jit(ko.fn)
    ja = jax.jit(lambda w, h, b: ka.fn(
        w, h, b.reshape(2, b.shape[-1] // stride, stride)))
    yo = jo(w0_old, xj)
    _force(yo)
    print("windowed ctaps compiled", flush=True)
    ya = ja(w0_new, xh, xb)
    _force(ya)
    print("aligned ctaps compiled", flush=True)
    m0 = np.asarray(yo[0])
    a0 = np.asarray(ya[0])
    np.testing.assert_allclose(a0, m0, atol=2e-2 if not f32 else 1e-4)
    assert np.array_equal(a0[:, 128:], m0[:, 128:]), \
        "j>=1 blocks must be bit-identical on hardware"
    print("correctness gate passed (j>=1 bit-identical)", flush=True)

    to, ta = _median_ab(jo, ja, (w0_old, xj), (w0_new, xh, xb))
    print(json.dumps({
        "config": "config1_ctaps_aligned_ab", "n": n,
        "precision": "f32" if f32 else "bf16",
        "windowed_msps": round(n / to / 1e6, 1),
        "aligned_msps": round(n / ta / 1e6, 1),
        "windowed_ms": round(to * 1e3, 3), "aligned_ms": round(ta * 1e3, 3),
        "speedup": round(to / ta, 3),
    }), flush=True)


if __name__ == "__main__":
    n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 26
    f32 = len(sys.argv) > 2 and sys.argv[2] == "f32"
    print("backend:", jax.default_backend(), flush=True)
    main(n_log2, f32)
