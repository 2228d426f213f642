"""Channel-DP sharding of the round-5 waveform serving tiers on the
8-virtual-device CPU mesh: the OFDM and SC-FDE plane receivers are
per-channel independent (pure sharding, zero collectives), so the
sharded runs must be BIT-identical to single-device — the docs/design
round-5 addendum's claim, asserted."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from srcdsp_tpu.chains.ofdm import make_ofdm_spec, ofdm_modulate, sym_len
from srcdsp_tpu.chains.ofdm_planes import make_ofdm_rx_planes
from srcdsp_tpu.chains.qam import qam_constellation
from srcdsp_tpu.dist import make_mesh


def test_ofdm_rx_planes_channel_sharded():
    mesh = make_mesh(time=8)              # used as the channel axis here
    spec = make_ofdm_spec(nfft=64, cp=16, n_active=52, order=16)
    rng = np.random.default_rng(0)
    c, nsym = 8, 40
    na = spec.active.size
    pts = np.asarray(qam_constellation(16))
    pilot = pts[rng.integers(0, 16, na)]
    y = []
    for ch in range(c):
        points = np.concatenate(
            [pilot[None], pts[rng.integers(0, 16, (nsym, na))]], axis=0)
        tx = np.asarray(ofdm_modulate(spec, jnp.asarray(points)))
        rx = tx + 0.01 * (rng.standard_normal(tx.size)
                          + 1j * rng.standard_normal(tx.size))
        y.append(rx.astype(np.complex64))
    y = np.stack(y)
    k = (y.shape[-1] // sym_len(spec)) * sym_len(spec)
    yr = jnp.asarray(y.real[:, :k].astype(np.float32))
    yi = jnp.asarray(y.imag[:, :k].astype(np.float32))
    pr = jnp.asarray(pilot.real.astype(np.float32))
    pi = jnp.asarray(pilot.imag.astype(np.float32))

    fn = jax.jit(make_ofdm_rx_planes(spec))
    idx1, (zr1, _) = fn(yr, yi, pr, pi)

    sh = NamedSharding(mesh, P("time", None))
    idx2, (zr2, _) = fn(jax.device_put(yr, sh), jax.device_put(yi, sh),
                        pr, pi)
    np.testing.assert_array_equal(np.asarray(idx2), np.asarray(idx1))
    np.testing.assert_array_equal(np.asarray(zr2), np.asarray(zr1))


def test_scfde_rx_planes_channel_sharded():
    from srcdsp_tpu.chains.scfde import make_scfde_spec, scfde_tx
    from srcdsp_tpu.chains.scfde_planes import make_scfde_rx_planes

    mesh = make_mesh(time=8)
    spec = make_scfde_spec(n=256, cp=32)
    rng = np.random.default_rng(1)
    pts = np.asarray(qam_constellation(4))
    c, s = 8, 6
    y = []
    for ch in range(c):
        tx = np.asarray(scfde_tx(
            spec, jnp.asarray(pts[rng.integers(0, 4, (s, spec.n))])))
        rx = tx + 0.02 * (rng.standard_normal(tx.size)
                          + 1j * rng.standard_normal(tx.size))
        y.append(rx.astype(np.complex64))
    y = np.stack(y)
    yr = jnp.asarray(y.real.astype(np.float32))
    yi = jnp.asarray(y.imag.astype(np.float32))

    fn = jax.jit(make_scfde_rx_planes(spec, order=4, snr=200.0))
    idx1, _ = fn(yr, yi)
    sh = NamedSharding(mesh, P("time", None))
    idx2, _ = fn(jax.device_put(yr, sh), jax.device_put(yi, sh))
    np.testing.assert_array_equal(np.asarray(idx2), np.asarray(idx1))


def test_css_demod_planes_symbol_sharded():
    """CSS serving demod is per-symbol independent: the [S, N] batch
    sharded across 8 devices decodes BIT-identically to single-device
    (both the folded-direct and four-step forms)."""
    from srcdsp_tpu.chains import css
    from srcdsp_tpu.chains.css_planes import make_css_demod_planes

    mesh = make_mesh(time=8)
    p = css.make_css_params(sf=7)
    rng = np.random.default_rng(2)
    ks = rng.integers(0, p.n, 256)
    x = css.css_modulate(p, ks)
    x += (0.2 * (rng.standard_normal(x.size)
                 + 1j * rng.standard_normal(x.size))).astype(np.complex64)
    fr = x.reshape(-1, p.n)
    xr = jnp.asarray(fr.real.astype(np.float32))
    xi = jnp.asarray(fr.imag.astype(np.float32))
    for direct in (True, False):
        fn = jax.jit(make_css_demod_planes(p, direct=direct))
        k1, m1 = fn(xr, xi)
        sh = NamedSharding(mesh, P("time", None))
        k2, m2 = fn(jax.device_put(xr, sh), jax.device_put(xi, sh))
        np.testing.assert_array_equal(np.asarray(k2), np.asarray(k1))
        np.testing.assert_array_equal(np.asarray(m2), np.asarray(m1))
