"""NOAA APT imagery: frame constants, sync trains vs independent
construction, and the full image -> MPX (-> FM IQ) -> image round
trip."""

import numpy as np
import jax
import jax.numpy as jnp

from srcdsp_tpu.chains import apt


def test_layout_and_sync_trains():
    lay = apt.apt_line_layout()
    assert sum(w for _, w in lay.values()) == apt.WORDS_PER_LINE == 2080
    # independent construction of sync A: a 1040 Hz square wave sampled
    # at the 4160 Hz word rate, starting high at word 4, for 7 cycles
    a = apt.apt_sync_a()
    for i in range(39):
        t = (i - 4) / 4160.0
        want = 1.0 if (0 <= i - 4 < 28
                       and (t * 1040.0) % 1.0 < 0.5) else 0.0
        assert a[i] == want, i
    # sync B: 832 pulses/s, 3-high/2-low at word rate, 7 pulses
    b = apt.apt_sync_b()
    assert b.sum() == 21 and a.sum() == 14
    for c in range(7):
        assert np.all(b[4 + 5 * c: 4 + 5 * c + 3] == 1.0)
    # the two trains must be distinguishable by the sync-A correlator
    tpl = a - a.mean()
    assert tpl @ (a - a.mean()) > 2.5 * abs(tpl @ (b - b.mean()))


def _test_image(nl, rng):
    # smooth random image (the envelope detector band-limits ~2 kHz,
    # so single-pixel deltas are not representable — like the real link)
    img = rng.standard_normal((nl, 909))
    k = np.ones(9) / 9.0
    img = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, img)
    img = (img - img.min()) / (img.max() - img.min())
    return img.astype(np.float32)


def test_apt_mpx_round_trip(rng):
    p = apt.make_apt_params()
    img = _test_image(12, rng)
    lines = apt.apt_build_lines(img)
    # start mid-line: the receiver must find the line phase itself
    mpx = apt.apt_modulate(p, lines)
    cut = 700 * int(p.sps)
    mpx = np.concatenate([mpx[cut:], mpx[:cut]])
    out = apt.apt_decode_mpx(p, mpx)
    assert out["offset"] == (apt.WORDS_PER_LINE - 700) % apt.WORDS_PER_LINE
    got = out["video_a"][1:-1]                    # full interior lines
    # alignment: verify against the best circular row match (the
    # rotation wrapped part of a line), then demand high fidelity
    errs = []
    for shift in range(img.shape[0]):
        cand = np.roll(img, -shift, axis=0)[1: got.shape[0] + 1]
        errs.append(np.mean((cand - got) ** 2))
    best = float(min(errs))
    sig = float(np.var(img))
    assert best < sig / 100.0                     # >= 20 dB pixel SNR
    # channel B is the inverse image under the same sync
    gb = out["video_b"][1:-1]
    shift = int(np.argmin(errs))
    ca = np.roll(img, -shift, axis=0)[1: got.shape[0] + 1]
    assert np.mean((1.0 - ca - gb) ** 2) < sig / 50.0


def test_cli_apt_writes_pgm(rng, tmp_path):
    from srcdsp_tpu.chains.analog import fm_modulate
    from srcdsp_tpu.cli import main as cli_main
    from srcdsp_tpu.io.capture import CaptureMeta, write_capture

    p = apt.make_apt_params()
    img = _test_image(6, rng)
    mpx = apt.apt_modulate(p, apt.apt_build_lines(img))
    dev = 0.25
    iq = np.asarray(fm_modulate(jnp.asarray(mpx * 0.9), dev)
                    ).astype(np.complex64)
    capf = str(tmp_path / "apt.cf32")
    write_capture(capf, iq, CaptureMeta(fmt="cf32"))
    out = str(tmp_path / "apt.pgm")
    cli_main(["apt", capf, out, "--dev", str(dev * 0.9)])
    raw = open(out, "rb").read()
    assert raw.startswith(b"P5\n2080 6\n255\n")
    pix = np.frombuffer(raw.split(b"\n", 3)[3], np.uint8).reshape(6, 2080)
    lay = apt.apt_line_layout()
    a0, aw = lay["video_a"]
    got = pix[1:-1, a0: a0 + aw].astype(np.float32) / 255.0
    ref = img[1: 1 + got.shape[0]]
    assert np.mean((ref - got) ** 2) < float(np.var(img)) / 20.0


def test_apt_full_fm_iq_round_trip(rng):
    from srcdsp_tpu.chains.analog import fm_modulate
    from srcdsp_tpu.chains.fsk import discriminate

    p = apt.make_apt_params()
    img = _test_image(8, rng)
    mpx = apt.apt_modulate(p, apt.apt_build_lines(img))
    dev = 0.25
    iq = np.asarray(fm_modulate(jnp.asarray(mpx * 0.9), dev))
    iq = iq + 0.002 * (rng.standard_normal(iq.size)
                       + 1j * rng.standard_normal(iq.size))
    last = jnp.zeros((1,), jnp.complex64)
    _, d = jax.jit(discriminate)(last, jnp.asarray(iq.astype(np.complex64)))
    mpx_rx = np.asarray(d) / (dev * 0.9)
    out = apt.apt_decode_mpx(p, mpx_rx.astype(np.float32))
    assert out["offset"] == 0
    got = out["video_a"][1:-1]
    ref = img[1: got.shape[0] + 1]
    assert np.mean((ref - got) ** 2) < float(np.var(img)) / 50.0
