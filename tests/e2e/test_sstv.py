"""SSTV Martin M1: VIS codec, schedule structure, and the full
image -> audio -> decoded RGB round trip."""

import numpy as np

from srcdsp_tpu.chains import sstv


def _smooth_rgb(rng, h, w):
    img = rng.standard_normal((h, w, 3))
    k = np.ones(15) / 15.0
    for c in range(3):
        img[:, :, c] = np.apply_along_axis(
            lambda r: np.convolve(r, k, "same"), 1, img[:, :, c])
    img = (img - img.min()) / (img.max() - img.min())
    return img.astype(np.float32)


def test_vis_bits_parity():
    # Martin M1 VIS 44 = 0101100b LSB-first, even parity
    bits = sstv._vis_bits(sstv.MARTIN_M1_VIS)
    assert len(bits) == 8
    assert sum(bits[:7]) % 2 == bits[7]
    assert sum(b << i for i, b in enumerate(bits[:7])) == 44


def test_schedule_durations():
    p = sstv.make_sstv_params(height=2)
    rng = np.random.default_rng(0)
    seg = sstv.sstv_schedule(p, _smooth_rgb(rng, 2, 320))
    total = sum(d for _, d in seg)
    # header 610 ms + VIS 300 ms + 2 lines of ~446.446 ms
    line = 4.862e-3 + 0.572e-3 + 3 * (146.432e-3 + 0.572e-3)
    assert abs(total - (0.610 + 0.300 + 2 * line)) < 1e-9
    # frequency range stays inside the 1100..2300 band
    fr = [f for f, _ in seg]
    assert min(fr) >= 1100.0 and max(fr) <= 2300.0


def test_sstv_round_trip_with_noise(rng):
    h = 16
    p = sstv.make_sstv_params(height=h)
    img = _smooth_rgb(rng, h, 320)
    audio = sstv.sstv_modulate(p, img)
    # lead-in noise + channel noise at 20 dB audio SNR
    x = np.concatenate([0.02 * rng.standard_normal(3000).astype(np.float32),
                        audio])
    x = x + (0.1 * rng.standard_normal(x.size)).astype(np.float32)
    out = sstv.sstv_decode(p, x)
    assert out["ok"] and out["vis"] == sstv.MARTIN_M1_VIS
    got = out["image"]
    # ignore the two edge pixels of each scan (filter/slot bleed)
    err = (got[:, 2:-2, :] - img[:, 2:-2, :]) ** 2
    snr = 10 * np.log10(float(np.var(img)) / float(err.mean()))
    assert snr > 12.0, snr   # clean decode measures ~19; 20 dB audio noise costs ~6


def test_sstv_rejects_noise(rng):
    p = sstv.make_sstv_params(height=4)
    x = (0.3 * rng.standard_normal(60000)).astype(np.float32)
    out = sstv.sstv_decode(p, x)
    assert not out["ok"]


def test_cli_sstv_writes_ppm(rng, tmp_path):
    from srcdsp_tpu.cli import main as cli_main

    h = 8
    p = sstv.make_sstv_params(height=h)
    img = _smooth_rgb(rng, h, 320)
    audio = sstv.sstv_modulate(p, img)
    raw = str(tmp_path / "sstv.f32")
    audio.astype(np.float32).tofile(raw)
    out = str(tmp_path / "sstv.ppm")
    cli_main(["sstv", raw, out, "--mpx", "--lines", str(h)])
    data = open(out, "rb").read()
    assert data.startswith(b"P6\n320 8\n255\n")
    pix = np.frombuffer(data.split(b"\n", 3)[3], np.uint8)
    got = pix.reshape(h, 320, 3).astype(np.float32) / 255.0
    err = (got[:, 2:-2, :] - img[:, 2:-2, :]) ** 2
    assert 10 * np.log10(float(np.var(img)) / float(err.mean())) > 14.0
