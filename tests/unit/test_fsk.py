"""FSK demod chain tests (SURVEY.md C8; BASELINE config 4 shape)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srcdsp_tpu.chains.fsk import (
    FskParams, discriminate, fsk_apply, fsk_demod_stream, fsk_init, make_fsk_params,
)
from srcdsp_tpu.chains.sync import timing_estimate, timing_sample
from srcdsp_tpu.ops.nco import TWO_PI
from srcdsp_tpu.testing.signals import complex_awgn, fsk_baseband, random_bits, tone


def test_discriminator_recovers_tone_freq():
    f = 0.01
    x = tone(4096, f)
    _, d = discriminate(jnp.zeros((1,), jnp.complex64), x)
    # all samples after the first measure exactly f
    np.testing.assert_allclose(np.asarray(d[1:]), f, atol=1e-5)


def test_timing_estimate_finds_peak_offset():
    # periodic energy bump at offset 3 of period 8
    sps = 8
    nsym = 64
    m = np.zeros(sps * nsym, np.float32)
    m[3::sps] = 1.0
    acc, tau = timing_estimate(jnp.zeros((), jnp.complex64), jnp.asarray(m), sps)
    assert abs(float(tau) - 3.0) < 1e-3


def test_timing_sample_linear_interp():
    sps = 4
    x = jnp.arange(12, dtype=jnp.float32)  # 3 symbols
    last = jnp.arange(-5, 0, dtype=jnp.float32)  # continues the ramp: xin[j] = j-5
    tau = jnp.asarray(1.5, jnp.float32)
    new_last, sym = timing_sample(last, x, tau, sps)
    # positions k*sps + (tau+1) mod sps = 4k + 2.5 -> values 4k - 2.5
    np.testing.assert_allclose(np.asarray(sym), [-2.5, 1.5, 5.5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_last), [7, 8, 9, 10, 11], atol=0)


def _run_chain(snr_db=None, nsym=512, key=0):
    """Build a config-4-shaped single channel and demodulate it."""
    decim, sps, dev = 4, 8, 0.05
    in_sps = decim * sps
    center = 0.11
    kb, kn = jax.random.split(jax.random.PRNGKey(key))
    bits = random_bits(kb, (nsym,))
    bb = fsk_baseband(bits, in_sps, dev / decim)  # deviation at input rate
    x = bb * tone(bb.shape[-1], center)
    if snr_db is not None:
        x = x + complex_awgn(kn, x.shape, power=10 ** (-snr_db / 10))
    params = make_fsk_params(center, num_taps=64, cutoff=0.03,
                             decim=decim, sps=sps, dev=dev)
    return bits, params, x


def _ber(bits, rx_bits, settle=16):
    """Bit error rate ignoring settle symbols and trying small alignments."""
    b = np.asarray(bits)
    r = np.asarray(rx_bits)
    best = 1.0
    for lag in range(-16, 17):
        bs, rs = settle + max(lag, 0), settle + max(-lag, 0)
        n = min(len(b) - bs, len(r) - rs)
        if n <= 0:
            continue
        err = np.mean(b[bs: bs + n] != r[rs: rs + n])
        best = min(best, float(err))
    return best


def test_fsk_clean_ber_zero():
    bits, params, x = _run_chain(snr_db=None)
    rx_bits, soft = fsk_demod_stream(params, x, block=x.shape[-1])
    assert _ber(bits, rx_bits) == 0.0


def test_fsk_noisy_ber_low():
    bits, params, x = _run_chain(snr_db=20.0)
    rx_bits, _ = fsk_demod_stream(params, x, block=x.shape[-1])
    assert _ber(bits, rx_bits) < 0.01


def test_fsk_block_streaming_matches_oneshot():
    """Streaming in small blocks must match one-shot (bit-exact block joins)."""
    bits, params, x = _run_chain(snr_db=30.0, nsym=256)
    one_bits, one_soft = fsk_demod_stream(params, x, block=x.shape[-1])
    blk_bits, blk_soft = fsk_demod_stream(params, x, block=x.shape[-1] // 8)
    # Discriminator/filter/NCO are exactly streaming; timing tau differs only
    # through the forgetting-factor schedule, so soft values agree closely.
    assert _ber(one_bits, blk_bits) < 0.01


@pytest.mark.slow
def test_fsk_multichannel_vmap():
    """32 channels demodulated as one vmapped call (config 4 channel count)."""
    nch, nsym = 32, 128
    decim, sps, dev = 4, 8, 0.05
    in_sps = decim * sps
    center = 0.11
    kb = jax.random.PRNGKey(7)
    bits = random_bits(kb, (nch, nsym))
    bb = fsk_baseband(bits, in_sps, dev / decim)
    x = bb * tone(bb.shape[-1], center)
    params = make_fsk_params(center, num_taps=64, cutoff=0.03,
                             decim=decim, sps=sps, dev=dev)
    state = fsk_init(params, channel_shape=(nch,))
    state, (rx, _) = jax.jit(fsk_apply)(params, state, x)
    errs = [_ber(bits[c], rx[c]) for c in range(nch)]
    assert max(errs) == 0.0
