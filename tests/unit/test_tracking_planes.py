"""Plane-form tracking loops (axon subset) vs the complex-API forms.

Loop-level twins must match to f32 rounding on identical inputs; the
full plane chains must decode the drifting-clock fixtures the complex
chains were built for (tests/e2e/test_tracking.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.chains.psk import (constellation_offset, diff_decode,
                                   diff_encode, make_psk_params)
from srcdsp_tpu.chains.sync_loop import (costas_init, costas_scan,
                                         gardner_init, gardner_scan)
from srcdsp_tpu.chains.tracking_planes import (costas_scan_planes,
                                               fsk_track_planes_apply,
                                               fsk_track_planes_init,
                                               gardner_scan_planes,
                                               psk_track_planes_apply,
                                               psk_track_planes_init)
from srcdsp_tpu.ops.resample import resample_full


def _warp_clock(x: np.ndarray, amp: float, period: float) -> np.ndarray:
    n = np.arange(len(x) - int(np.ceil(amp)) - 1, dtype=np.float64)
    t = n + amp * np.sin(2 * np.pi * n / period)
    i0 = np.floor(t).astype(np.int64)
    f = t - i0
    return ((1 - f) * x[i0] + f * x[i0 + 1]).astype(np.complex64)


def _ser(b, d, settle=128):
    best = 1.0
    for lag in range(-160, 161):
        bs, rs = settle + max(lag, 0), settle + max(-lag, 0)
        n = min(len(b) - bs, len(d) - rs)
        if n > 64:
            best = min(best, float(np.mean(b[bs:bs + n] != d[rs:rs + n])))
    return best


def test_gardner_scan_planes_matches_complex():
    """Same loop math on a CONVERGING input (a pulse-shaped QPSK stream
    with a fixed timing offset): the twins agree to f32 rounding early
    and stay within loop-jitter tolerance throughout. (On unstructured
    noise the TED recurrence is chaotic and 1-ulp differences compound —
    not a meaningful comparison.)"""
    order, sps, nsym = 4, 4, 512
    rng = np.random.default_rng(0)
    data = rng.integers(0, order, nsym)
    sym = np.exp(2j * np.pi * (data + 0.5) / order).astype(np.complex64)
    params = make_psk_params(0.0, decim=1, sps=sps, order=order)
    x = np.asarray(resample_full(params.taps, jnp.asarray(sym),
                                 up=sps, down=1))[None, : nsym * sps]
    st_c2, sym_c = gardner_scan(gardner_init((1,), tau0=1.3),
                                jnp.asarray(x), sps)
    st_p2, (sr, si) = gardner_scan_planes(
        gardner_init((1,), tau0=1.3), jnp.asarray(x.real),
        jnp.asarray(x.imag), sps)
    sym_c = np.asarray(sym_c)
    np.testing.assert_allclose(np.asarray(sr)[:, :64], sym_c.real[:, :64],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(sr), sym_c.real, atol=1e-3)
    np.testing.assert_allclose(np.asarray(si), sym_c.imag, atol=1e-3)
    np.testing.assert_allclose(np.asarray(st_p2.tau), np.asarray(st_c2.tau),
                               atol=1e-3)


def test_costas_scan_planes_matches_complex():
    rng = np.random.default_rng(1)
    order, k, c = 4, 256, 2
    data = rng.integers(0, order, (c, k))
    off = constellation_offset(order)
    sym = np.exp(2j * np.pi * (data + off) / order).astype(np.complex64)
    sym = sym * np.exp(1j * (0.3 + 0.002 * np.arange(k)))  # phase ramp
    sym = sym.astype(np.complex64)
    st_c2, out = costas_scan(costas_init((c,)), jnp.asarray(sym), order,
                             offset=off)
    st_p2, (yr, yi) = costas_scan_planes(
        costas_init((c,)), jnp.asarray(sym.real), jnp.asarray(sym.imag),
        order, offset=off)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(out).real,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(yi), np.asarray(out).imag,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(st_p2.phase),
                               np.asarray(st_c2.phase), atol=1e-3)


def test_psk_track_planes_decodes_wandering_clock():
    order, sps, nsym = 4, 4, 4096
    data = np.asarray(jax.random.randint(jax.random.PRNGKey(0), (nsym,),
                                         0, order))
    tx = np.asarray(diff_encode(jnp.asarray(data), order))
    off = constellation_offset(order)
    sym = np.exp(2j * np.pi * (tx + off) / order).astype(np.complex64)
    params = make_psk_params(0.0, decim=1, sps=sps, order=order)
    clean = np.asarray(resample_full(params.taps, jnp.asarray(sym),
                                     up=sps, down=1))
    drift = _warp_clock(clean, amp=1.5, period=2048.0)

    block = 2048
    n = (len(drift) // block) * block
    st = psk_track_planes_init(params, 1)
    step = jax.jit(lambda s, p: psk_track_planes_apply(params, s, p))
    idxs = []
    for b in range(n // block):
        chunk = drift[b * block:(b + 1) * block]
        planes = jnp.asarray(np.stack([chunk.real, chunk.imag])[None]
                             .astype(np.float32))
        st, (idx, _, _) = step(st, planes)
        idxs.append(np.asarray(idx[0]))
    d = np.asarray(diff_decode(jnp.asarray(np.concatenate(idxs)), order))
    ser = _ser(data, d)
    assert ser == 0.0, f"plane tracking SER {ser}"


def test_fsk_track_planes_decodes_wandering_clock():
    from srcdsp_tpu.chains.fsk import make_fsk_params
    from srcdsp_tpu.testing.signals import fsk_baseband, random_bits

    decim, sps, dev = 2, 8, 0.02
    nsym = 4096
    bits = random_bits(jax.random.PRNGKey(2), (nsym,))
    bb = np.asarray(fsk_baseband(bits, decim * sps, dev))
    drift = _warp_clock(bb, amp=1.5, period=4096.0)
    params = make_fsk_params(0.0, 64, 0.45 / decim, decim=decim, sps=sps,
                             dev=dev * decim)

    block = 4096
    n = (len(drift) // block) * block
    st = fsk_track_planes_init(params, 1)
    step = jax.jit(lambda s, p: fsk_track_planes_apply(params, s, p))
    outs = []
    for b in range(n // block):
        chunk = drift[b * block:(b + 1) * block]
        planes = jnp.asarray(np.stack([chunk.real, chunk.imag])[None]
                             .astype(np.float32))
        st, (rb, _) = step(st, planes)
        outs.append(np.asarray(rb[0]))
    r = np.concatenate(outs)
    ber = _ser(np.asarray(bits), r)
    assert ber == 0.0, f"plane FSK tracking BER {ber}"


def _sustained_offset(x, rho):
    nmax = int((len(x) - 2) / (1 + rho))
    n = np.arange(nmax, dtype=np.float64)
    t = n * (1 + rho)
    i0 = np.floor(t).astype(np.int64)
    f = t - i0
    return ((1 - f) * x[i0] + f * x[i0 + 1]).astype(np.complex64)


def test_psk_ragged_planes_holds_ser_zero_on_sustained_ppm():
    """Plane twin of the skip/stuff tracker: 3000 ppm fast clock — the
    emitted count follows the true clock and SER stays 0."""
    from srcdsp_tpu.chains.tracking import compact_ragged
    from srcdsp_tpu.chains.tracking_planes import (
        psk_track_ragged_planes_apply, psk_track_ragged_planes_init)

    order, sps, nsym = 4, 4, 8192
    data = np.asarray(jax.random.randint(jax.random.PRNGKey(7), (nsym,),
                                         0, order))
    tx = np.asarray(diff_encode(jnp.asarray(data), order))
    off = constellation_offset(order)
    sym = np.exp(2j * np.pi * (tx + off) / order).astype(np.complex64)
    params = make_psk_params(0.0, decim=1, sps=sps, order=order)
    clean = np.asarray(resample_full(params.taps, jnp.asarray(sym),
                                     up=sps, down=1))
    rx = _sustained_offset(clean, rho=3e-3)

    block = 2048
    n = (len(rx) // block) * block
    st = psk_track_ragged_planes_init(params, 1)
    step = jax.jit(lambda s, p: psk_track_ragged_planes_apply(params, s, p))
    idxs, valids = [], []
    for b in range(n // block):
        chunk = rx[b * block:(b + 1) * block]
        planes = jnp.asarray(np.stack([chunk.real, chunk.imag])[None]
                             .astype(np.float32))
        st, (idx, _, _, valid) = step(st, planes)
        idxs.append(np.asarray(idx[0]))
        valids.append(np.asarray(valid[0]))
    idx_all = compact_ragged(np.concatenate(idxs), np.concatenate(valids))
    nominal = n // params.sps
    assert idx_all.size > nominal + 10, (idx_all.size, nominal)
    d = np.asarray(diff_decode(jnp.asarray(idx_all), order))
    assert _ser(data, d) == 0.0
