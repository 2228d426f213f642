"""Pulse-Doppler processing (ops/radar.py): moving point target lands
at the right (Doppler, range) cell through the full map + 2-D CFAR
pipeline; the integral-image ring means match a brute-force loop twin;
empirical false-alarm rate tracks the design pfa."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.ops.radar import (cfar_2d, detections, pulse_compress,
                                  range_doppler)
from srcdsp_tpu.testing.signals import chirp


def _cube(p, n, ref, delay, fd, amp=1.0):
    """P pulses, target echo at `delay` samples with per-pulse Doppler
    phase e^{j 2 pi fd p}."""
    cube = np.zeros((p, n), np.complex64)
    l = ref.size
    for k in range(p):
        cube[k, delay: delay + l] += (amp * ref
                                      * np.exp(2j * np.pi * fd * k))
    return cube


def test_point_target_lands_at_right_cell():
    p, n, delay = 32, 512, 137
    fd = 5.0 / p                          # exactly bin +5
    ref = np.asarray(chirp(64, -0.2, 0.2)).astype(np.complex64)
    rng = np.random.default_rng(0)
    cube = _cube(p, n, ref, delay, fd)
    cube += 0.1 * (rng.standard_normal(cube.shape)
                   + 1j * rng.standard_normal(cube.shape))

    rd = jax.jit(lambda c: range_doppler(c, jnp.asarray(ref)))(
        jnp.asarray(cube))
    pw = np.abs(np.asarray(rd)) ** 2
    d_idx, r_idx = np.unravel_index(np.argmax(pw), pw.shape)
    assert r_idx == delay
    assert d_idx == p // 2 + 5            # fftshifted zero at P//2

    mask, _thr = cfar_2d(jnp.asarray(pw.astype(np.float32)),
                         guard=2, train=4, pfa=1e-6)
    dets = detections(pw, np.asarray(mask))
    assert len(dets) >= 1
    assert (dets[0][0], dets[0][1]) == (d_idx, r_idx)


def test_cfar2d_ring_mean_matches_loop_twin():
    rng = np.random.default_rng(1)
    pw = rng.exponential(1.0, (24, 40)).astype(np.float32)
    guard, train = 1, 3
    _mask, thr = cfar_2d(jnp.asarray(pw), guard=guard, train=train,
                         pfa=1e-3)
    from srcdsp_tpu.ops.radar import cfar_alpha_2d
    ho = guard + train
    n_train = (2 * ho + 1) ** 2 - (2 * guard + 1) ** 2
    alpha = cfar_alpha_2d(n_train, 1e-3)
    pad = np.pad(pw, ho, mode="reflect")
    for a, b in [(0, 0), (5, 7), (23, 39), (12, 0)]:
        box = pad[a: a + 2 * ho + 1, b: b + 2 * ho + 1]
        inner = pad[a + train: a + train + 2 * guard + 1,
                    b + train: b + train + 2 * guard + 1]
        want = alpha * (box.sum() - inner.sum()) / n_train
        np.testing.assert_allclose(float(thr[a, b]), want, rtol=2e-5)


def test_cfar2d_empirical_pfa():
    rng = np.random.default_rng(2)
    pw = rng.exponential(1.0, (256, 512)).astype(np.float32)
    pfa = 1e-3
    mask, _ = cfar_2d(jnp.asarray(pw), guard=1, train=4, pfa=pfa)
    emp = float(np.asarray(mask).mean())
    assert 0.3 * pfa < emp < 3.0 * pfa, emp
