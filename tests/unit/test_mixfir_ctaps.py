"""Complex-taps fused mix+FIR+decim kernel vs kernels/mixfir (same math,
mix reassociated through the filter -> tolerance match, exact streaming)."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.kernels.mixfir import make_mix_fir_kernel, mix_fir_decim_pallas
from srcdsp_tpu.kernels.mixfir_ctaps import (make_mix_fir_ctaps_kernel,
                                             mix_fir_ctaps_pallas)
from srcdsp_tpu.ops.nco import freq_to_word
from srcdsp_tpu.ops.window import lowpass


def _fixture(n_blocks=4, decim=2, t=64):
    taps = lowpass(t, 0.2)
    word = int(freq_to_word(0.11))
    kc = make_mix_fir_ctaps_kernel(taps, word, decim, out_tile=128,
                                   b_rows=2, interpret=True)
    km = make_mix_fir_kernel(taps, decim, out_tile=128, b_rows=2,
                             interpret=True)
    n = n_blocks * kc.block_in()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, kc.hist + n)).astype(np.float32)
    x[:, :kc.hist] = 0.0
    return taps, word, kc, km, n, x


def test_matches_mixfir_reference():
    taps, word, kc, km, n, x = _fixture()
    w0 = (-kc.hist * word) % (1 << 32)
    rr, ri = mix_fir_decim_pallas(km, w0, word, jnp.asarray(x))
    cr, ci = mix_fir_ctaps_pallas(kc, w0, jnp.asarray(x))
    scale = float(np.max(np.abs(np.asarray(rr))))
    np.testing.assert_allclose(np.asarray(cr), np.asarray(rr),
                               rtol=0, atol=2e-5 * scale)
    np.testing.assert_allclose(np.asarray(ci), np.asarray(ri),
                               rtol=0, atol=2e-5 * scale)


def test_streaming_chunks_bit_identical():
    # phase words are exact ints -> two half launches == one launch
    taps, word, kc, km, n, x = _fixture(n_blocks=4)
    w0 = (-kc.hist * word) % (1 << 32)
    one_r, one_i = mix_fir_ctaps_pallas(kc, w0, jnp.asarray(x))
    nh = n // 2
    parts = []
    for b in range(2):
        xb = x[:, b * nh: kc.hist + (b + 1) * nh]
        w0b = ((b * nh - kc.hist) * word) % (1 << 32)
        parts.append(np.asarray(
            jnp.stack(mix_fir_ctaps_pallas(kc, w0b, jnp.asarray(xb)))))
    got = np.concatenate(parts, axis=-1)
    np.testing.assert_array_equal(got[0], np.asarray(one_r))
    np.testing.assert_array_equal(got[1], np.asarray(one_i))


def test_ctaps_bf16_ingest_variant():
    """bf16-ingest kernel (in_dtype=bfloat16): same math at the bf16
    quantization floor, outputs f32, chunked streaming bit-exact."""
    import jax
    import jax.numpy as jnp

    taps = lowpass(64, 0.2)
    word = int(freq_to_word(0.11))
    kf = make_mix_fir_ctaps_kernel(taps, word, 2, out_tile=128, b_rows=4,
                                   precision=jax.lax.Precision.DEFAULT,
                                   interpret=True)
    kb = make_mix_fir_ctaps_kernel(taps, word, 2, out_tile=128, b_rows=4,
                                   precision=jax.lax.Precision.DEFAULT,
                                   in_dtype=jnp.bfloat16, interpret=True)
    n = kf.block_in() * 2
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, kf.hist + n)).astype(np.float32)
    w0 = (-kf.hist * word) % (1 << 32)
    yr_f, yi_f = mix_fir_ctaps_pallas(kf, w0, jnp.asarray(x))
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    yr_b, yi_b = mix_fir_ctaps_pallas(kb, w0, xb)
    assert yr_b.dtype == jnp.float32
    ref = np.asarray(yr_f) + 1j * np.asarray(yi_f)
    out = np.asarray(yr_b) + 1j * np.asarray(yi_b)
    snr = 10 * np.log10(np.mean(np.abs(ref) ** 2)
                        / np.mean(np.abs(out - ref) ** 2))
    assert snr > 30.0, f"bf16-ingest SNR {snr:.1f} dB"

    # chunked streaming bit-exact in the bf16 pipeline
    half = n // 2
    ya = mix_fir_ctaps_pallas(kb, w0, xb[:, : kf.hist + half])
    w1 = (w0 + half * word) % (1 << 32)
    yb = mix_fir_ctaps_pallas(kb, w1, xb[:, half:])
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(ya[0]), np.asarray(yb[0])], axis=1),
        np.asarray(yr_b))
