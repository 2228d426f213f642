"""Fused Pallas kernel vs the XLA plane path (SURVEY.md §4.2 kernel tier).

Runs in interpret mode on CPU; the same kernel compiles to Mosaic on TPU
(bench.py exercises that path on the real chip).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srcdsp_tpu.kernels.mixfir import (
    make_mix_fir_kernel, mix_fir_decim_pallas, toeplitz_taps,
)
from srcdsp_tpu.ops.fir import fir_full
from srcdsp_tpu.ops.nco import freq_to_word, nco_apply, nco_init
from srcdsp_tpu.ops.planes import (
    fused_mix_fir_decim_planes, phase_coef_matrix, plane_hist_len,
)
from srcdsp_tpu.ops.window import lowpass
from srcdsp_tpu.testing.signals import complex_awgn


def test_toeplitz_matrix_defines_fir():
    """Dense matmul with H_T == direct causal FIR on a random window."""
    t, m, ot, hk = 16, 2, 8, 16
    taps = lowpass(t, 0.2)
    ht = toeplitz_taps(taps, m, ot, hk)
    rng = np.random.default_rng(0)
    xpad = rng.standard_normal(ot * m + hk).astype(np.float32)
    y = xpad @ ht
    # reference: y[j] = sum_a h[a] * xpad[j*m + hk - a]
    ref = np.asarray([
        sum(taps[a] * xpad[j * m + hk - a] for a in range(t) if j * m + hk - a >= 0)
        for j in range(ot)
    ])
    np.testing.assert_allclose(y, ref, atol=1e-5)


@pytest.mark.parametrize("t,m", [(64, 2), (33, 4), (128, 1)])
def test_kernel_matches_planes_interpret(t, m):
    taps = lowpass(t, 0.4 / max(m, 2))
    k = make_mix_fir_kernel(taps, m, out_tile=128, b_rows=2, interpret=True)
    n = 4 * k.block_in()
    word = int(freq_to_word(0.0931))
    x = complex_awgn(jax.random.PRNGKey(0), (n,))
    xpad = jnp.concatenate([jnp.zeros(k.hist, jnp.complex64), x])
    planes = jnp.stack([jnp.real(xpad), jnp.imag(xpad)]).astype(jnp.float32)
    word0 = (-k.hist * word) % (1 << 32)
    yr, yi = mix_fir_decim_pallas(k, word0, word, planes)
    got = np.asarray(yr[0]) + 1j * np.asarray(yi[0])
    # reference: complex mix + fir
    _, mixed = nco_apply(jnp.asarray(word, jnp.uint32), nco_init(), x)
    ref = np.asarray(fir_full(jnp.asarray(taps), mixed, decim=m))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 2e-6, f"rel L2 {rel:.2e}"


def test_kernel_chunked_streaming_bit_exact():
    """Kernel over two chunks == kernel over one buffer (u32 phase carry)."""
    t, m = 32, 2
    taps = lowpass(t, 0.2)
    k = make_mix_fir_kernel(taps, m, out_tile=128, b_rows=2, interpret=True)
    blk = k.block_in()
    n = 4 * blk
    word = int(freq_to_word(0.217))
    x = complex_awgn(jax.random.PRNGKey(1), (n,))
    xpad = jnp.concatenate([jnp.zeros(k.hist, jnp.complex64), x])
    planes = jnp.stack([jnp.real(xpad), jnp.imag(xpad)]).astype(jnp.float32)
    word0 = (-k.hist * word) % (1 << 32)
    yr_a, yi_a = mix_fir_decim_pallas(k, word0, word, planes)
    half = n // 2
    p1 = planes[:, : k.hist + half]
    p2 = planes[:, half: k.hist + n]
    w2 = (word0 + half * word) % (1 << 32)
    yr1, yi1 = mix_fir_decim_pallas(k, word0, word, p1)
    yr2, yi2 = mix_fir_decim_pallas(k, w2, word, p2)
    np.testing.assert_array_equal(
        np.asarray(jnp.concatenate([yr1, yr2], -1)), np.asarray(yr_a))
    np.testing.assert_array_equal(
        np.asarray(jnp.concatenate([yi1, yi2], -1)), np.asarray(yi_a))


def test_multichannel_kernel_matches_single():
    """MC kernel per channel == single-channel kernel with that word."""
    from srcdsp_tpu.kernels.mixfir import (
        make_mix_fir_kernel_mc, mix_fir_decim_pallas_mc)
    t, m, nch = 32, 2, 3
    taps = lowpass(t, 0.2)
    kmc = make_mix_fir_kernel_mc(taps, m, nch, out_tile=128, b_rows=2,
                                 interpret=True)
    k1 = make_mix_fir_kernel(taps, m, out_tile=128, b_rows=2, interpret=True)
    n = 2 * k1.block_in()
    words = np.asarray([freq_to_word(f) for f in (0.05, 0.21, 0.33)], np.uint32)
    words0 = np.asarray([(-kmc.hist * int(w)) % (1 << 32) for w in words],
                        np.uint32)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((nch, 2, kmc.hist + n)).astype(np.float32)
    yr, yi = mix_fir_decim_pallas_mc(kmc, words0, words, jnp.asarray(x))
    for c in range(nch):
        r1, i1 = mix_fir_decim_pallas(k1, int(words0[c]), int(words[c]),
                                      jnp.asarray(x[c]))
        np.testing.assert_array_equal(np.asarray(yr[c]), np.asarray(r1[0]))
        np.testing.assert_array_equal(np.asarray(yi[c]), np.asarray(i1[0]))


def test_multichannel_kernel_per_channel_taps():
    """[C, T] tap sets: each channel filtered with its own design."""
    from srcdsp_tpu.kernels.mixfir import (
        make_mix_fir_kernel_mc, mix_fir_decim_pallas_mc)
    m, nch = 2, 3
    taps = np.stack([lowpass(32, c) for c in (0.05, 0.15, 0.3)])
    kmc = make_mix_fir_kernel_mc(taps, m, nch, out_tile=128, b_rows=2,
                                 interpret=True)
    k1s = [make_mix_fir_kernel(taps[c], m, out_tile=128, b_rows=2,
                               interpret=True) for c in range(nch)]
    n = 2 * k1s[0].block_in()
    words = np.asarray([freq_to_word(f) for f in (0.05, 0.21, 0.33)], np.uint32)
    words0 = np.asarray([(-kmc.hist * int(w)) % (1 << 32) for w in words],
                        np.uint32)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((nch, 2, kmc.hist + n)).astype(np.float32)
    yr, yi = mix_fir_decim_pallas_mc(kmc, words0, words, jnp.asarray(x))
    for c in range(nch):
        r1, i1 = mix_fir_decim_pallas(k1s[c], int(words0[c]), int(words[c]),
                                      jnp.asarray(x[c]))
        np.testing.assert_array_equal(np.asarray(yr[c]), np.asarray(r1[0]))
        np.testing.assert_array_equal(np.asarray(yi[c]), np.asarray(i1[0]))


def test_rows_kernel_matches_classic():
    """Row-aligned kernel (kernels.mixfir_rows) == classic windowed kernel
    to float-reassociation (chunked accumulation order differs)."""
    import numpy as np
    import jax.numpy as jnp
    from srcdsp_tpu.kernels.mixfir import (
        make_mix_fir_kernel, mix_fir_decim_pallas)
    from srcdsp_tpu.kernels.mixfir_rows import (
        make_mix_fir_rows_kernel, mix_fir_rows_pallas)
    from srcdsp_tpu.ops.nco import freq_to_word
    from srcdsp_tpu.ops.window import lowpass

    taps = lowpass(64, 0.2)
    word = int(freq_to_word(0.11))
    k0 = make_mix_fir_kernel(taps, 2, out_tile=512, b_rows=4, interpret=True)
    k1 = make_mix_fir_rows_kernel(taps, 2, out_tile=512, b_rows=4,
                                  interpret=True)
    n = 3 * k0.block_in()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, k0.hist + n)).astype(np.float32))
    w0 = (-k0.hist * word) % (1 << 32)
    r0, i0 = mix_fir_decim_pallas(k0, w0, word, x)
    r1, i1 = mix_fir_rows_pallas(k1, w0, word, x)
    a = np.asarray(r0[0]) + 1j * np.asarray(i0[0])
    b = np.asarray(r1[0]) + 1j * np.asarray(i1[0])
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel < 2e-6, f"rel {rel:.2e}"


def test_pipelined_bit_identical_to_manual_dma():
    """Dual-BlockSpec pipelined staging == manual blocking slab DMA,
    bit-exact (same slab, same matmuls — only HBM->VMEM staging differs).
    Covers single-channel and multi-channel forms."""
    from srcdsp_tpu.kernels.mixfir import (
        make_mix_fir_kernel_mc, mix_fir_decim_pallas_mc)

    taps = lowpass(64, 0.2)
    word = int(freq_to_word(0.0931))
    rng = np.random.default_rng(11)

    km = make_mix_fir_kernel(taps, 2, out_tile=128, b_rows=2,
                             pipelined=False, interpret=True)
    kp = make_mix_fir_kernel(taps, 2, out_tile=128, b_rows=2,
                             pipelined=True, interpret=True)
    n = 4 * km.block_in()
    planes = jnp.asarray(
        rng.standard_normal((2, km.hist + n)).astype(np.float32))
    ym = mix_fir_decim_pallas(km, 12345, word, planes)
    yp = mix_fir_decim_pallas(kp, 12345, word, planes)
    for a, b in zip(ym, yp):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    c = 3
    km = make_mix_fir_kernel_mc(taps, 2, c, out_tile=128, b_rows=2,
                                pipelined=False, interpret=True)
    kp = make_mix_fir_kernel_mc(taps, 2, c, out_tile=128, b_rows=2,
                                pipelined=True, interpret=True)
    n = 2 * km.block_in()
    planes = jnp.asarray(
        rng.standard_normal((c, 2, km.hist + n)).astype(np.float32))
    words = np.asarray([100, 200, 300], np.uint32)
    dwords = np.asarray([word, word + 7, word - 5], np.uint32)
    ym = mix_fir_decim_pallas_mc(km, words, dwords, planes)
    yp = mix_fir_decim_pallas_mc(kp, words, dwords, planes)
    for a, b in zip(ym, yp):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
