"""Scan-based tracking loops: convergence + drift tracking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srcdsp_tpu.chains.sync_loop import (
    costas_init, costas_scan, gardner_init, gardner_scan,
)
from srcdsp_tpu.ops.nco import TWO_PI
from srcdsp_tpu.ops.resample import resample_full
from srcdsp_tpu.ops.window import root_raised_cosine


def _qpsk_baseband(key, nsym, sps, beta=0.35):
    idx = jax.random.randint(key, (nsym,), 0, 4)
    sym = jnp.exp(1j * TWO_PI * (idx.astype(jnp.float32) + 0.5) / 4)
    rrc = root_raised_cosine(sps, 8, beta)
    # tx+rx matched filtering -> RC pulse, ISI-free at symbol centers
    x = resample_full(rrc, sym.astype(jnp.complex64), up=sps, down=1)
    from srcdsp_tpu.ops.fir import fir_full
    x = fir_full(jnp.asarray(rrc), x)
    return idx, x


def test_gardner_locks_and_outputs_symbols():
    sps = 8
    idx, x = _qpsk_baseband(jax.random.PRNGKey(0), 512, sps)
    st = gardner_init(tau0=3.0)  # start well off the true timing
    st, sym = gardner_scan(st, x, sps)
    # after settling, sampled symbols should be near the unit circle
    tail = np.asarray(sym)[-200:]
    mag = np.abs(tail)
    assert np.std(mag) < 0.2 * np.mean(mag), "timing did not lock"


def test_gardner_tracks_clock_drift():
    """A 100 ppm sample-clock offset walks tau ~0.8 samples over the block
    (within one symbol — slips need the block-level O&M path); the loop's
    frequency integrator must track it."""
    sps = 8
    idx, x0 = _qpsk_baseband(jax.random.PRNGKey(1), 1024, sps)
    n = x0.shape[-1]
    t = jnp.arange(n) * (1.0 + 1e-4)
    i0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, n - 2)
    frac = (t - i0).astype(jnp.float32)
    xd = x0[i0] * (1 - frac) + x0[i0 + 1] * frac
    st = gardner_init()
    st, sym = gardner_scan(st, xd, sps)
    tail = np.asarray(sym)[-200:]
    mag = np.abs(tail)
    assert np.std(mag) < 0.2 * np.mean(mag), "lost lock under clock drift"


def test_costas_converges_and_tracks_cfo():
    nsym = 1024
    key = jax.random.PRNGKey(2)
    idx = jax.random.randint(key, (nsym,), 0, 4)
    sym = jnp.exp(1j * TWO_PI * (idx.astype(jnp.float32) + 0.5) / 4).astype(jnp.complex64)
    # constant phase offset + small per-symbol frequency offset
    k = jnp.arange(nsym)
    rx = sym * jnp.exp(1j * (0.7 + 0.01 * k)).astype(jnp.complex64)
    st = costas_init()
    st, out = costas_scan(st, rx, order=4)
    tail = np.asarray(out)[-200:]
    ang = np.angle(tail) * 4 / TWO_PI  # distance to nearest constellation pt
    frac = np.abs(ang - np.round(ang))
    assert np.mean(frac) < 0.05, f"residual phase error {np.mean(frac):.3f}"


def test_gardner_vmap_channels():
    """Loop trackers vmap over channels (per-channel carried loop state)."""
    sps = 8
    xs = []
    for seed in (0, 1, 2):
        _, x = _qpsk_baseband(jax.random.PRNGKey(seed), 256, sps)
        xs.append(x)
    xb = jnp.stack(xs)
    st = gardner_init(channel_shape=(3,), tau0=2.0)
    st2, sym = jax.vmap(lambda s, x: gardner_scan(
        type(s)(tau=s.tau, freq=s.freq), x, sps))(
        jax.tree_util.tree_map(lambda a: a, st), xb)
    assert sym.shape[0] == 3
    for c in range(3):
        ref_st, ref_sym = gardner_scan(gardner_init(tau0=2.0), xb[c], sps)
        np.testing.assert_allclose(np.asarray(sym[c]), np.asarray(ref_sym),
                                   atol=1e-5)
