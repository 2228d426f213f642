"""Fused mix+resample Pallas kernel vs the XLA resampler (SURVEY.md C5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srcdsp_tpu.kernels.resample_pallas import make_mix_resample_kernel, mix_resample_pallas
from srcdsp_tpu.ops.nco import freq_to_word, nco_apply, nco_init
from srcdsp_tpu.ops.resample import resample_full
from srcdsp_tpu.ops.window import lowpass
from srcdsp_tpu.testing.signals import complex_awgn


@pytest.mark.parametrize("up,down", [(3, 4), (1, 2), (2, 3), (5, 4)])
def test_mix_resample_kernel_matches_xla(up, down):
    t = 48
    taps = lowpass(t, 0.3 / max(up, down))
    # block_cols*down % up == 0: use block_cols=128 with up in {1,2,3,5}? need
    # 128*down % up == 0 -> choose out_tile/block_cols = 128*up
    bc = 128 * up if (128 * down) % up else 128
    k = make_mix_resample_kernel(taps, up, down, out_tile=bc, b_rows=2,
                                 block_cols=bc, interpret=True)
    nin = 4 * k.block_in()
    word = int(freq_to_word(0.123))
    x = complex_awgn(jax.random.PRNGKey(up * 10 + down), (nin,))
    xpad = jnp.concatenate([jnp.zeros(k.hist, jnp.complex64), x])
    planes = jnp.stack([jnp.real(xpad), jnp.imag(xpad)]).astype(jnp.float32)
    word0 = (-k.hist * word) % (1 << 32)
    yr, yi = mix_resample_pallas(k, word0, word, planes)
    got = np.asarray(yr[0]) + 1j * np.asarray(yi[0])
    _, mixed = nco_apply(jnp.asarray(word, jnp.uint32), nco_init(), x)
    ref = np.asarray(resample_full(jnp.asarray(taps), mixed, up, down))
    n = min(len(got), len(ref))
    rel = np.linalg.norm(got[:n] - ref[:n]) / np.linalg.norm(ref[:n])
    assert rel < 2e-6, f"rel {rel:.2e}"


def test_combined_taps_fuse_fir_then_resample():
    """hc = h2 conv up_L(h1): ONE kernel == FIR(h1) -> resample(h2) chain
    (the config-2 single-kernel fusion)."""
    from srcdsp_tpu.kernels.resample_pallas import combine_fir_resample_taps
    from srcdsp_tpu.ops.fir import fir_full

    up, down = 3, 4
    h1 = lowpass(128, 0.2)
    h2 = lowpass(48, 0.3)
    hc = combine_fir_resample_taps(h1, h2, up)
    assert len(hc) == 48 + 3 * 127

    k = make_mix_resample_kernel(hc, up, down, out_tile=384, b_rows=2,
                                 block_cols=384, interpret=True)
    nin = 2 * k.block_in()
    word = int(freq_to_word(0.07))
    x = complex_awgn(jax.random.PRNGKey(7), (nin,))
    xpad = jnp.concatenate([jnp.zeros(k.hist, jnp.complex64), x])
    planes = jnp.stack([jnp.real(xpad), jnp.imag(xpad)]).astype(jnp.float32)
    word0 = (-k.hist * word) % (1 << 32)
    yr, yi = mix_resample_pallas(k, word0, word, planes)
    got = np.asarray(yr[0]) + 1j * np.asarray(yi[0])

    _, mixed = nco_apply(jnp.asarray(word, jnp.uint32), nco_init(), x)
    u = fir_full(jnp.asarray(h1), mixed)
    ref = np.asarray(resample_full(jnp.asarray(h2), u, up, down))
    n = min(len(got), len(ref))
    rel = np.linalg.norm(got[:n] - ref[:n]) / np.linalg.norm(ref[:n])
    assert rel < 5e-6, f"rel {rel:.2e}"


def test_combined_taps_tight_hist_round():
    """hist_round=8 (trimmed Toeplitz band) is numerically identical to the
    lane-rounded default in interpret mode."""
    from srcdsp_tpu.kernels.resample_pallas import combine_fir_resample_taps

    up, down = 3, 4
    hc = combine_fir_resample_taps(lowpass(128, 0.2), lowpass(48, 0.3), up)
    word = int(freq_to_word(0.07))
    outs = []
    for hr in (128, 8):
        k = make_mix_resample_kernel(hc, up, down, out_tile=384, b_rows=2,
                                     block_cols=384, hist_round=hr,
                                     interpret=True)
        nin = 2 * k.block_in()
        x = complex_awgn(jax.random.PRNGKey(9), (nin,))
        xpad = jnp.concatenate([jnp.zeros(k.hist, jnp.complex64), x])
        planes = jnp.stack([jnp.real(xpad), jnp.imag(xpad)]).astype(jnp.float32)
        word0 = (-k.hist * word) % (1 << 32)
        yr, yi = mix_resample_pallas(k, word0, word, planes)
        outs.append(np.asarray(yr[0]) + 1j * np.asarray(yi[0]))
    rel = np.linalg.norm(outs[0] - outs[1]) / np.linalg.norm(outs[0])
    assert rel < 1e-6, f"rel {rel:.2e}"


def test_mc_resample_kernel_matches_single():
    """Multi-channel kernel: per-channel NCO words, shared taps — each
    channel bit-identical to the single-channel kernel (config 2 is a
    4-channel chain)."""
    from srcdsp_tpu.kernels.resample_pallas import (
        make_mix_resample_kernel_mc, mix_resample_pallas_mc)

    up, down, cch = 3, 4, 4
    taps = lowpass(48, 0.3 / down)
    k1 = make_mix_resample_kernel(taps, up, down, out_tile=384, b_rows=2,
                                  block_cols=384, interpret=True)
    kc = make_mix_resample_kernel_mc(taps, up, down, cch, out_tile=384,
                                     b_rows=2, block_cols=384, interpret=True)
    assert k1.hist == kc.hist
    nin = 2 * kc.block_in()
    words = np.asarray([int(freq_to_word(0.02 * (c + 1))) for c in range(cch)],
                       np.uint64)
    rng = np.random.default_rng(11)
    x = rng.standard_normal((cch, 2, kc.hist + nin)).astype(np.float32)
    x[:, :, :kc.hist] = 0.0
    words0 = np.asarray([(-kc.hist * int(w)) % (1 << 32) for w in words],
                        np.uint32)
    yr, yi = mix_resample_pallas_mc(kc, words0, words.astype(np.uint32), x)
    for c in range(cch):
        r1, i1 = mix_resample_pallas(k1, int(words0[c]), int(words[c]),
                                     jnp.asarray(x[c]))
        np.testing.assert_array_equal(np.asarray(yr[c]), np.asarray(r1[0]))
        np.testing.assert_array_equal(np.asarray(yi[c]), np.asarray(i1[0]))


def test_pipelined_bit_identical_to_manual_dma():
    """Pipelined dual-BlockSpec staging == manual DMA for the L/M
    resampler, single- and multi-channel, bit-exact."""
    from srcdsp_tpu.kernels.resample_pallas import (
        make_mix_resample_kernel, make_mix_resample_kernel_mc,
        mix_resample_pallas, mix_resample_pallas_mc)
    from srcdsp_tpu.ops.nco import freq_to_word
    from srcdsp_tpu.ops.window import lowpass

    taps = lowpass(96, 0.2)
    word = int(freq_to_word(0.07))
    rng = np.random.default_rng(12)

    ks = [make_mix_resample_kernel(taps, 3, 4, out_tile=96, b_rows=2,
                                   block_cols=96,
                                   pipelined=p, interpret=True)
          for p in (False, True)]
    n = 4 * ks[0].block_in()
    planes = jnp.asarray(
        rng.standard_normal((2, ks[0].hist + n)).astype(np.float32))
    ym = mix_resample_pallas(ks[0], 999, word, planes)
    yp = mix_resample_pallas(ks[1], 999, word, planes)
    for a, b in zip(ym, yp):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    c = 2
    ks = [make_mix_resample_kernel_mc(taps, 3, 4, c, out_tile=96, b_rows=2,
                                      block_cols=96,
                                      pipelined=p, interpret=True)
          for p in (False, True)]
    n = 2 * ks[0].block_in()
    planes = jnp.asarray(
        rng.standard_normal((c, 2, ks[0].hist + n)).astype(np.float32))
    words = np.asarray([10, 20], np.uint32)
    dwords = np.asarray([word, word + 3], np.uint32)
    ym = mix_resample_pallas_mc(ks[0], words, dwords, planes)
    yp = mix_resample_pallas_mc(ks[1], words, dwords, planes)
    for a, b in zip(ym, yp):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
