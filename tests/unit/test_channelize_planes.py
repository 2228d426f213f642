"""On-chip (matmul-form) channelizer vs the complex-path bank (C10)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srcdsp_tpu.chains.channelizer import channelize_full, design_prototype
from srcdsp_tpu.ops.channelize_planes import make_channelize_planes
from srcdsp_tpu.testing.signals import complex_awgn


@pytest.mark.parametrize("m,p", [(8, 4), (16, 8), (64, 8)])
def test_matmul_bank_matches_complex_bank(m, p):
    h = design_prototype(m, taps_per_phase=p)
    bank = jax.jit(make_channelize_planes(h, m))
    x = np.asarray(complex_awgn(jax.random.PRNGKey(m), (m * 64,)))
    yr, yi = bank(jnp.asarray(x.real), jnp.asarray(x.imag))
    got = (np.asarray(yr) + 1j * np.asarray(yi)).T        # [M, K]
    ref = np.asarray(channelize_full(h, jnp.asarray(x), m))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 1e-5, f"rel {rel:.2e}"


def test_matmul_synthesis_matches_complex_bank():
    from srcdsp_tpu.chains.channelizer import synthesize_apply, synthesizer_init
    from srcdsp_tpu.ops.channelize_planes import make_synthesize_planes
    m, p = 8, 8
    h = design_prototype(m, taps_per_phase=p)
    rng = np.random.default_rng(0)
    y = (rng.standard_normal((m, 64)) + 1j * rng.standard_normal((m, 64))
         ).astype(np.complex64)
    st = synthesizer_init(h, m)
    _, ref = synthesize_apply(h, st, jnp.asarray(y), m)
    synth = jax.jit(make_synthesize_planes(h, m))
    yr = jnp.asarray(y.real.T.astype(np.float32))   # [K, M]
    yi = jnp.asarray(y.imag.T.astype(np.float32))
    xr, xi = synth(yr, yi)
    got = np.asarray(xr) + 1j * np.asarray(xi)
    rel = np.linalg.norm(got - np.asarray(ref)) / np.linalg.norm(np.asarray(ref))
    assert rel < 1e-5, f"rel {rel:.2e}"


def test_matmul_os2_bank_matches_complex_bank():
    from srcdsp_tpu.chains.channelizer import channelize_os2_full
    from srcdsp_tpu.ops.channelize_planes import make_channelize_os2_planes
    for m in (8, 16):
        h = design_prototype(m, taps_per_phase=8)
        bank = jax.jit(make_channelize_os2_planes(h, m))
        x = np.asarray(complex_awgn(jax.random.PRNGKey(m + 1), (m * 32,)))
        yr, yi = bank(jnp.asarray(x.real), jnp.asarray(x.imag))
        got = (np.asarray(yr) + 1j * np.asarray(yi)).T      # [M, K]
        ref = np.asarray(channelize_os2_full(h, jnp.asarray(x), m))
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 1e-5, f"M={m}: rel {rel:.2e}"


def test_bank_pallas_kernel_matches_xla_bank():
    from srcdsp_tpu.kernels.bank_pallas import make_bank_kernel, phase_major
    from srcdsp_tpu.ops.channelize_planes import make_channelize_planes
    m = 8
    h = design_prototype(m, taps_per_phase=4)
    fn, hist_cols = make_bank_kernel(h, m, b_k=16, interpret=True)
    rng = np.random.default_rng(3)
    n = 16 * m * 4
    x = rng.standard_normal((2, hist_cols * m + n)).astype(np.float32)
    x[:, :hist_cols * m] = 0.0  # stream start == bank's from-rest
    xp = phase_major(jnp.asarray(x), m, hist_cols * m)
    y = np.asarray(fn(xp))                    # [2M, K] channel-major
    yr, yi = y[:m].T, y[m:].T                 # back to frame-major [K, M]
    bank = make_channelize_planes(h, m)
    rr, ri = bank(jnp.asarray(x[0, hist_cols * m:]),
                  jnp.asarray(x[1, hist_cols * m:]))
    rel = (np.linalg.norm(yr - np.asarray(rr)) + np.linalg.norm(yi - np.asarray(ri))) \
        / (np.linalg.norm(np.asarray(rr)) + 1e-12)
    assert rel < 1e-5, f"rel {rel:.2e}"


def test_bank_os2_pallas_matches_os2_full():
    """2x-oversampled analysis via two critically-sampled Pallas bank calls
    (interpret) == channelize_os2_full."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from srcdsp_tpu.chains.channelizer import (
        channelize_os2_full, design_prototype)
    from srcdsp_tpu.kernels.bank_pallas import (
        bank_os2_pallas, make_bank_kernel, phase_major)
    from srcdsp_tpu.testing.signals import complex_awgn

    m, b_k = 8, 64
    proto = design_prototype(m, taps_per_phase=4)
    fn, hist_cols = make_bank_kernel(proto, m, b_k=b_k, interpret=True)
    k = 4 * b_k
    x = np.asarray(complex_awgn(jax.random.PRNGKey(6), (k * m,)))
    flat = np.zeros((2, (hist_cols + k) * m), np.float32)
    flat[0, hist_cols * m:] = x.real
    flat[1, hist_cols * m:] = x.imag
    y = np.asarray(bank_os2_pallas(fn, hist_cols, jnp.asarray(flat), m))
    got = y[:m] + 1j * y[m:]                      # [M, 2K]

    ref = np.asarray(channelize_os2_full(proto, jnp.asarray(x), m))  # [M, 2K]
    nk = min(got.shape[-1], ref.shape[-1]) - 2    # last odd frame may touch
    err = ref[:, :nk] - got[:, :nk]               # the zero tail pad
    snr = 10 * np.log10(np.mean(np.abs(ref[:, :nk]) ** 2)
                        / (np.mean(np.abs(err) ** 2) + 1e-30))
    assert snr > 100, f"snr {snr:.1f}"


def test_bank_pipelined_bit_identical_to_manual_dma():
    """Dual-BlockSpec pipelined staging == manual blocking slab DMA for
    the bank kernel and the bank+PSK-stats kernel, bit-exact."""
    from srcdsp_tpu.kernels.bank_pallas import (
        make_bank_kernel, make_bank_psk_kernel, phase_major)

    m, b_k = 8, 128
    k = 3 * b_k
    proto = design_prototype(m, taps_per_phase=4)
    rng = np.random.default_rng(7)
    hist_cols = 128  # p1-1 rounded up to a lane tile (asserted below)
    x = rng.standard_normal((2, (hist_cols + k) * m)).astype(np.float32)
    x[:, :hist_cols * m] = 0.0
    xp = phase_major(jnp.asarray(x), m, hist_cols)

    outs = {}
    for p in (False, True):
        fn, hc = make_bank_kernel(proto, m, b_k=b_k, pipelined=p,
                                  interpret=True)
        assert hc == hist_cols
        outs[p] = np.asarray(fn(xp))
    np.testing.assert_array_equal(outs[False], outs[True])

    for cm in (False, True):
        outs = {}
        for p in (False, True):
            fn, hc = make_bank_psk_kernel(
                proto, m, sps=4, order=4, b_k=b_k, class_major=cm,
                pipelined=p, interpret=True)
            assert hc == hist_cols
            y, st = fn(xp)
            outs[p] = (np.asarray(y), np.asarray(st))
        np.testing.assert_array_equal(outs[False][0], outs[True][0])
        np.testing.assert_array_equal(outs[False][1], outs[True][1])
