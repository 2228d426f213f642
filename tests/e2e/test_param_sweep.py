"""Demod chains across the parameter space: zero errors on clean signals
for every (decim, sps, deviation/order, center) combination."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srcdsp_tpu.chains.fsk import fsk_apply, fsk_init, make_fsk_params
from srcdsp_tpu.chains.psk import (
    constellation_offset, diff_decode, diff_encode, make_psk_params,
    psk_apply, psk_init,
)
from srcdsp_tpu.ops.nco import TWO_PI
from srcdsp_tpu.ops.resample import resample_full
from srcdsp_tpu.testing.signals import fsk_baseband, random_bits, tone


def _ber(b, r, settle=24):
    best = 1.0
    for lag in range(-24, 25):
        bs, rs = settle + max(lag, 0), settle + max(-lag, 0)
        n = min(len(b) - bs, len(r) - rs)
        if n <= 0:
            continue
        best = min(best, float(np.mean(b[bs:bs + n] != r[rs:rs + n])))
    return best


@pytest.mark.slow
@pytest.mark.parametrize("decim,sps,dev,center", [
    (1, 4, 0.1, 0.0), (2, 4, 0.08, -0.21), (8, 8, 0.04, 0.37),
    (2, 16, 0.02, -0.45), (3, 6, 0.06, 0.29),
])
def test_fsk_param_sweep(decim, sps, dev, center):
    bits = random_bits(jax.random.PRNGKey(decim * 100 + sps), (384,))
    bb = fsk_baseband(bits, decim * sps, dev / decim)
    x = (bb * tone(bb.shape[-1], center)).astype(jnp.complex64)
    p = make_fsk_params(center, 64, min(0.45 / decim, 2.5 * dev / decim),
                        decim, sps, dev)
    n_use = (x.shape[-1] // (decim * sps)) * decim * sps
    _, (rx, _) = fsk_apply(p, fsk_init(p), x[:n_use])
    assert _ber(np.asarray(bits), np.asarray(rx)) == 0.0


@pytest.mark.slow
@pytest.mark.parametrize("order,decim,sps,center", [
    (2, 1, 4, 0.31), (4, 4, 4, 0.05), (8, 2, 8, 0.41), (4, 1, 8, -0.33),
])
def test_psk_param_sweep(order, decim, sps, center):
    key = jax.random.PRNGKey(order * 10 + decim)
    data = jax.random.randint(key, (384,), 0, order)
    tx = diff_encode(data, order)
    off = constellation_offset(order)
    sym = jnp.exp(1j * TWO_PI * (tx.astype(jnp.float32) + off) / order)
    p = make_psk_params(center, decim=decim, sps=sps, order=order)
    x = resample_full(p.taps, sym.astype(jnp.complex64), up=decim * sps, down=1)
    x = (x * tone(x.shape[-1], center)).astype(jnp.complex64)
    n_use = (x.shape[-1] // (decim * sps)) * decim * sps
    _, (rx, _) = psk_apply(p, psk_init(p), x[:n_use])
    d = np.asarray(diff_decode(rx, order))
    assert _ber(np.asarray(data), d) == 0.0
