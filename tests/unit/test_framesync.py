"""Preamble correlator: detection accuracy, streaming, seam peaks."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.chains.framesync import (
    frame_sync_apply, frame_sync_init, make_frame_sync_params, peak_indices,
    peak_to_burst_start)


def _preamble(t=64, seed=42):
    rng = np.random.default_rng(seed)
    sym = rng.integers(0, 4, t)
    return np.exp(2j * np.pi * (sym + 0.5) / 4).astype(np.complex64)


def _scene(n, starts, preamble, snr_db=10.0, seed=0):
    rng = np.random.default_rng(seed)
    noise_amp = 10 ** (-snr_db / 20.0)
    x = noise_amp * (rng.standard_normal(n) + 1j * rng.standard_normal(n)
                     ) / np.sqrt(2)
    for s in starts:
        x[s:s + len(preamble)] += preamble
    return x.astype(np.complex64)


def _run_stream(params, x, block):
    st = frame_sync_init(params)
    masks, firsts = [], []
    for i in range(0, len(x), block):
        st, (_, mask, first) = frame_sync_apply(
            params, st, jnp.asarray(x[i:i + block]))
        masks.append(np.asarray(mask))
        firsts.append(int(np.asarray(first)))
    return peak_indices(masks, firsts)


def test_detects_exact_burst_starts():
    p = _preamble(64)
    starts = [500, 2100, 7000]
    x = _scene(8192, starts, p, snr_db=10.0)
    params = make_frame_sync_params(p, threshold=0.6)
    peaks = _run_stream(params, x, block=8192)
    got = sorted(peak_to_burst_start(pk, 64) for pk in peaks)
    assert got == starts, got


def test_streaming_matches_oneshot():
    p = _preamble(48)
    starts = [100, 3000, 6100]
    x = _scene(8192, starts, p, snr_db=8.0, seed=3)
    params = make_frame_sync_params(p, threshold=0.6)
    assert list(_run_stream(params, x, 8192)) \
        == list(_run_stream(params, x, 1024)) \
        == list(_run_stream(params, x, 512))


def test_seam_straddling_burst_detected_once():
    """A burst whose correlation peak lands exactly on a block boundary is
    found exactly once (the deferred-last-score seam logic)."""
    p = _preamble(64)
    t = 64
    for start in (1024 - t + 1, 1024 - t, 1024 - t + 2, 1023, 1024):
        x = _scene(4096, [start], p, snr_db=15.0, seed=start)
        params = make_frame_sync_params(p, threshold=0.6)
        peaks = _run_stream(params, x, block=1024)
        assert len(peaks) == 1, (start, peaks)
        assert peak_to_burst_start(peaks[0], t) == start, (start, peaks)


def test_no_false_alarms_on_noise():
    p = _preamble(64)
    x = _scene(16384, [], p, snr_db=10.0, seed=9)
    params = make_frame_sync_params(p, threshold=0.6)
    assert len(_run_stream(params, x, 4096)) == 0


def test_amplitude_invariance():
    """Normalized score: detection at 20 dB weaker input, same threshold."""
    p = _preamble(64)
    starts = [1000, 5000]
    x = _scene(8192, starts, p, snr_db=12.0, seed=5) * 0.1
    params = make_frame_sync_params(p, threshold=0.6)
    peaks = _run_stream(params, x, 2048)
    assert sorted(peak_to_burst_start(pk, 64) for pk in peaks) == starts
