"""Plane-form SC-FDE receiver: decisions match the complex tier
(scfde_rx + qam slicer) through a spectral-null multipath channel, and
SER 0 on the fixture."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.chains.qam import qam_constellation, qam_slice
from srcdsp_tpu.chains.scfde import make_scfde_spec, scfde_rx, scfde_tx
from srcdsp_tpu.chains.scfde_planes import make_scfde_rx_planes


def test_scfde_planes_match_complex_tier():
    order, s, c = 4, 24, 2
    spec = make_scfde_spec(n=256, cp=32)
    rng = np.random.default_rng(0)
    pts = np.asarray(qam_constellation(order))
    data_idx = rng.integers(0, order, (c, s, spec.n))
    snr = 200.0
    y = []
    for ch in range(c):
        tx = np.asarray(scfde_tx(spec, jnp.asarray(pts[data_idx[ch]])))
        hch = np.array([1.0, 0.0, 0.45 * np.exp(1j * 1.1)])
        rx = np.convolve(tx, hch)[: tx.size]
        rx = rx + 0.02 * (rng.standard_normal(rx.size)
                          + 1j * rng.standard_normal(rx.size))
        y.append(rx.astype(np.complex64))
    y = np.stack(y)

    # complex tier
    idx_c = []
    for ch in range(c):
        eq, _h = scfde_rx(spec, jnp.asarray(y[ch]), snr=snr)
        idx_c.append(np.asarray(qam_slice(eq, order)))
    idx_c = np.stack(idx_c)

    fn = jax.jit(make_scfde_rx_planes(spec, order=order, snr=snr))
    idx_p, _soft = fn(jnp.asarray(y.real.astype(np.float32)),
                      jnp.asarray(y.imag.astype(np.float32)))
    idx_p = np.asarray(idx_p)
    np.testing.assert_array_equal(idx_p, idx_c)
    assert float(np.mean(idx_p != data_idx)) == 0.0
