"""On-chip-form PSK demod vs the complex path (config 5 per-channel)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srcdsp_tpu.chains.fsk_planes import make_timing_tone
from srcdsp_tpu.chains.psk import (
    constellation_offset, diff_decode, diff_encode, make_psk_params,
)
from srcdsp_tpu.chains.psk_planes import psk_demod_planes
from srcdsp_tpu.ops.fir import fir_full
from srcdsp_tpu.ops.nco import TWO_PI
from srcdsp_tpu.ops.resample import resample_full


def _ser(b, d, settle=24):
    best = 1.0
    for lag in range(-24, 25):
        bs, rs = settle + max(lag, 0), settle + max(-lag, 0)
        n = min(len(b) - bs, len(d) - rs)
        if n <= 0:
            continue
        best = min(best, float(np.mean(b[bs:bs + n] != d[rs:rs + n])))
    return best


@pytest.mark.parametrize("order", [2, 4])
def test_psk_planes_clean_ser_zero(order):
    nsym, sps = 512, 4
    key = jax.random.PRNGKey(order)
    data = jax.random.randint(key, (nsym,), 0, order)
    tx = diff_encode(data, order)
    off = constellation_offset(order)
    sym = jnp.exp(1j * TWO_PI * (tx.astype(jnp.float32) + off) / order)
    params = make_psk_params(0.0, decim=1, sps=sps, order=order)
    x = resample_full(params.taps, sym.astype(jnp.complex64), up=sps, down=1)
    bb = fir_full(params.taps, x)   # matched filter at the channel rate
    yr = jnp.real(bb)[None].astype(jnp.float32)
    yi = jnp.imag(bb)[None].astype(jnp.float32)
    k = yr.shape[-1] - (yr.shape[-1] % sps)
    yr, yi = yr[:, :k], yi[:, :k]
    tc, ts = make_timing_tone(k, sps)
    acc, (idx, soft) = psk_demod_planes(
        yr, yi, sps, order, jnp.asarray(tc), jnp.asarray(ts), offset=off)
    d = np.asarray(diff_decode(idx[0], order))
    assert _ser(np.asarray(data), d) == 0.0
