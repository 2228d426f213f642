"""End-to-end acceptance tests: the five BASELINE.json configs, reduced size
(SURVEY.md §4.2 e2e tier). Accuracy is checked against the C++ oracle (N1)
or internal cross-paths; throughput is bench/'s job, correctness is ours.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srcdsp_tpu import oracle
from srcdsp_tpu.configs import (
    build_config1, build_config2, build_config3, build_config4, build_config5,
)


def _snr_db(ref, test):
    ref = np.asarray(ref)
    err = ref - np.asarray(test)
    p = np.mean(np.abs(ref) ** 2)
    e = np.mean(np.abs(err) ** 2)
    return np.inf if e == 0 else 10 * np.log10(p / e)


def test_config1_matches_oracle():
    built = build_config1(n=1 << 16)
    (xr, xi) = built.example
    yr, yi = built.step(xr, xi)
    got = np.asarray(yr[0]) + 1j * np.asarray(yi[0])
    # oracle chain: mix + fir on the same padded stream
    from srcdsp_tpu.ops.window import lowpass
    from srcdsp_tpu.ops.nco import freq_to_word
    x = (np.asarray(xr[0]) + 1j * np.asarray(xi[0])).astype(np.complex64)
    word = int(freq_to_word(0.11))
    h = np.asarray(lowpass(64, 0.2))
    from srcdsp_tpu.ops.planes import plane_hist_len
    hist = plane_hist_len(64, 2)
    word0 = (-hist * word) % (1 << 32)
    mixed, _ = oracle.nco_mix(x, word0, word)
    # the planes op treats the first `hist` samples as live delay-line
    # history, so filter the full padded stream and drop the warmup outputs
    ref = oracle.fir(mixed, h, decim=2)[hist // 2:]
    assert _snr_db(ref, got) > 100


def test_config1_pallas_interpret_matches_oracle():
    built = build_config1(n=1 << 14, use_pallas=True, interpret=True)
    (planes,) = built.example
    yr, yi = built.step(planes)
    got = np.asarray(yr[0]) + 1j * np.asarray(yi[0])
    from srcdsp_tpu.ops.window import lowpass
    from srcdsp_tpu.ops.nco import freq_to_word
    from srcdsp_tpu.kernels.mixfir import make_mix_fir_kernel
    k = make_mix_fir_kernel(lowpass(64, 0.2), 2)
    x = (np.asarray(planes[0]) + 1j * np.asarray(planes[1])).astype(np.complex64)
    word = int(freq_to_word(0.11))
    word0 = (-k.hist * word) % (1 << 32)
    mixed, _ = oracle.nco_mix(x, word0, word)
    ref = oracle.fir(mixed, lowpass(64, 0.2), decim=2)[k.hist // 2:]
    assert _snr_db(ref, got) > 100


def test_config2_resample_chain_vs_oracle():
    built = build_config2(n=1 << 12, channels=2)
    nco_s, fir_s, rs_s, x = built.example
    _, _, _, z = built.step(nco_s, fir_s, rs_s, x)
    # oracle per channel
    from srcdsp_tpu.ops.window import lowpass
    from srcdsp_tpu.ops.nco import freq_to_word
    word = int(freq_to_word(0.07))
    t128 = np.asarray(lowpass(128, 0.2))
    t48 = np.asarray(lowpass(48, 0.3))
    for c in range(2):
        xc = np.asarray(x[c])
        mixed, _ = oracle.nco_mix(xc, 0, word)
        filt = oracle.fir(mixed, t128)
        ref = oracle.resample(filt, t48, 3, 4)
        assert _snr_db(ref, np.asarray(z[c])) > 90


def test_config3_fftconv_equals_direct_fir():
    built = build_config3(n=1 << 14, channels=3, fft_size=4096, num_taps=1024)
    st, x = built.example
    _, y = built.step(st, x)
    from srcdsp_tpu.ops.window import lowpass
    taps = np.asarray(lowpass(1024, 0.1))
    for c in range(3):
        ref = oracle.fir(np.asarray(x[c]), taps)
        assert _snr_db(ref, np.asarray(y[c])) > 90


def test_config4_fsk_ber_zero():
    built = build_config4(nsym=256, channels=8)
    st, x = built.example
    bits = np.asarray(built.meta["bits"])
    _, (rx, soft) = built.step(st, x)
    rx = np.asarray(rx)
    for c in range(8):
        best = 1.0
        for lag in range(-16, 17):
            bs, rs = 16 + max(lag, 0), 16 + max(-lag, 0)
            n = min(bits.shape[-1] - bs, rx.shape[-1] - rs)
            best = min(best, float(np.mean(bits[c, bs:bs + n] != rx[c, rs:rs + n])))
        assert best == 0.0, f"channel {c}"


def test_config5_runs_and_is_finite():
    built = build_config5(frames=128, num_channels=16)
    (x,) = built.example
    out = built.step(x)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_config5_distributed_matches_local():
    """Config 5 on an 8-device mesh == single-device, bit-exact."""
    from srcdsp_tpu.dist import make_mesh
    mesh = make_mesh(time=8)
    local = build_config5(frames=128, num_channels=16)
    dist = build_config5(frames=128, num_channels=16, mesh=mesh)
    out_l = local.step(*local.example)
    out_d = dist.step(*dist.example)
    np.testing.assert_array_equal(np.asarray(out_l), np.asarray(out_d))
