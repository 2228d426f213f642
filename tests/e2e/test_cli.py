"""File -> chain -> file CLI driver (SURVEY.md L4 harness parity)."""

import numpy as np
import jax

from srcdsp_tpu.cli import main as cli_main
from srcdsp_tpu.io.capture import CaptureMeta, write_capture, read_capture
from srcdsp_tpu.testing.signals import fsk_baseband, random_bits, tone


def test_cli_fsk_roundtrip(tmp_path):
    decim, sps, dev, center = 4, 8, 0.05, 0.11
    bits = random_bits(jax.random.PRNGKey(0), (1024,))
    bb = fsk_baseband(bits, decim * sps, dev / decim)
    x = np.asarray(bb * tone(bb.shape[-1], center))
    cap = str(tmp_path / "cap.cf32")
    write_capture(cap, x, CaptureMeta(fmt="cf32"))
    out = str(tmp_path / "bits.u8")
    cli_main(["fsk", cap, out, "--center", str(center), "--decim", str(decim),
              "--sps", str(sps), "--dev", str(dev), "--block", "8192",
              "--cutoff", "0.03"])
    rx = np.fromfile(out, np.uint8)
    b = np.asarray(bits)
    best = 1.0
    for lag in range(-16, 17):
        bs, rs = 16 + max(lag, 0), 16 + max(-lag, 0)
        n = min(len(b) - bs, len(rx) - rs)
        if n > 0:
            best = min(best, float(np.mean(b[bs:bs + n] != rx[rs:rs + n])))
    assert best < 0.01


def test_cli_fir_writes_capture(tmp_path):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(1 << 14) + 1j * rng.standard_normal(1 << 14)
         ).astype(np.complex64)
    cap = str(tmp_path / "in.cf32")
    write_capture(cap, x, CaptureMeta(fmt="cf32"))
    out = str(tmp_path / "out.cf32")
    cli_main(["fir", cap, out, "--taps", "32", "--cutoff", "0.2",
              "--decim", "2", "--block", "4096"])
    y, meta = read_capture(out)
    assert meta.fmt == "cf32" and len(y) == (1 << 14) // 2


def test_cli_checkpoint_resume(tmp_path):
    """Crash-resume: a run killed after a checkpoint continues IN PLACE in
    the same outfile and ends bit-identical to an unbroken run; the
    checkpoint is deleted on completion."""
    import jax.numpy as jnp
    from srcdsp_tpu import checkpoint
    from srcdsp_tpu.chains.fsk import fsk_apply, fsk_init, make_fsk_params
    from srcdsp_tpu.io.capture import read_capture_blocks

    decim, sps, dev, center = 4, 8, 0.05, 0.11
    bits = random_bits(jax.random.PRNGKey(1), (2048,))
    bb = fsk_baseband(bits, decim * sps, dev / decim)
    x = np.asarray(bb * tone(bb.shape[-1], center))
    cap = str(tmp_path / "cap.cf32")
    write_capture(cap, x, CaptureMeta(fmt="cf32"))
    ck = str(tmp_path / "ck")

    # reference: unbroken CLI run
    ref_out = str(tmp_path / "ref.u8")
    cli_main(["fsk", cap, ref_out, "--center", str(center), "--block", "8192",
              "--cutoff", "0.03"])
    ref = np.fromfile(ref_out, np.uint8)

    # simulate a crash at block 3: run the same chain library-side for 3
    # blocks, leaving the partial outfile + checkpoint a crashed CLI would
    params = make_fsk_params(center, 64, 0.03, decim, sps, dev)
    st = fsk_init(params)
    out = str(tmp_path / "resumed.u8")
    with open(out, "wb") as f:
        for i, xb in enumerate(read_capture_blocks(cap, 8192)):
            if i == 3:
                break
            st, (b, _) = fsk_apply(params, st, jnp.asarray(xb))
            f.write(np.asarray(b).astype(np.uint8).tobytes())
            # pretend block 2's checkpoint landed but block 2's output was
            # only partially flushed — resume must truncate it away
    checkpoint.save(ck, st, block_index=3)
    with open(out, "ab") as f:
        f.write(b"\xff" * 17)  # torn post-crash garbage past the checkpoint

    cli_main(["fsk", cap, out, "--center", str(center), "--block", "8192",
              "--cutoff", "0.03", "--ckpt", ck, "--ckpt-every", "3"])
    got = np.fromfile(out, np.uint8)
    np.testing.assert_array_equal(ref, got)
    assert not checkpoint.exists(ck), "checkpoint must be deleted on completion"


def test_cli_channelize_roundtrip(tmp_path):
    """channelize subcommand: wideband tone in channel m's band lands in
    out.chMMM.cf32 and nowhere else (file -> bank -> per-channel files)."""
    from srcdsp_tpu.io.capture import read_capture

    m = 8
    n = 1 << 14
    target = 3
    x = np.asarray(tone(n, target / m)).astype(np.complex64)
    cap = str(tmp_path / "wb.cf32")
    write_capture(cap, x, CaptureMeta(fmt="cf32"))
    out = str(tmp_path / "bank")
    cli_main(["channelize", cap, out, "--channels", str(m),
              "--taps-per-phase", "4", "--block", "4096"])
    powers = []
    for c in range(m):
        y, meta = read_capture(f"{out}.ch{c:03d}.cf32")
        assert meta.fmt == "cf32" and len(y) == n // m
        powers.append(float(np.mean(np.abs(y[64:]) ** 2)))
    assert powers[target] > 100 * max(p for c, p in enumerate(powers)
                                      if c != target)


def test_cli_channelize_demod(tmp_path):
    """channelize --demod psk writes per-channel symbol indices."""
    m, sps = 8, 4
    n = 1 << 14
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)
    cap = str(tmp_path / "wb.cf32")
    write_capture(cap, x, CaptureMeta(fmt="cf32"))
    out = str(tmp_path / "dm")
    cli_main(["channelize", cap, out, "--channels", str(m),
              "--taps-per-phase", "4", "--demod", "psk", "--sps", str(sps),
              "--order", "4", "--block", "4096"])
    for c in range(m):
        idx = np.fromfile(f"{out}.ch{c:03d}.u8", np.uint8)
        assert len(idx) == n // m // sps and idx.max() < 4


def test_cli_order_validated(tmp_path):
    import pytest
    cap = str(tmp_path / "x.cf32")
    write_capture(cap, np.zeros(1024, np.complex64), CaptureMeta(fmt="cf32"))
    with pytest.raises(SystemExit):
        cli_main(["psk", cap, str(tmp_path / "o.u8"), "--order", "300"])
    with pytest.raises(SystemExit):
        cli_main(["psk", cap, str(tmp_path / "o.u8"), "--order", "6"])


def test_cli_psk_roundtrip(tmp_path):
    import jax.numpy as jnp
    from srcdsp_tpu.chains.psk import (
        constellation_offset, diff_decode, diff_encode)
    from srcdsp_tpu.chains.psk import make_psk_params
    from srcdsp_tpu.ops.resample import resample_full
    from srcdsp_tpu.ops.nco import TWO_PI
    order, decim, sps, center = 4, 2, 4, 0.17
    key = jax.random.PRNGKey(2)
    data = jax.random.randint(key, (512,), 0, order)
    tx = diff_encode(data, order)
    off = constellation_offset(order)
    sym = jnp.exp(1j * TWO_PI * (tx.astype(jnp.float32) + off) / order)
    p = make_psk_params(center, decim=decim, sps=sps, order=order)
    x = resample_full(p.taps, sym.astype(jnp.complex64), up=decim * sps, down=1)
    from srcdsp_tpu.testing.signals import tone
    x = np.asarray(x * tone(x.shape[-1], center))
    cap = str(tmp_path / "psk.cf32")
    write_capture(cap, x, CaptureMeta(fmt="cf32"))
    out = str(tmp_path / "syms.u8")
    cli_main(["psk", cap, out, "--center", str(center), "--decim", str(decim),
              "--sps", str(sps), "--order", str(order), "--block", "2048"])
    rx = np.fromfile(out, np.uint8).astype(np.int32)
    d = np.asarray(diff_decode(jnp.asarray(rx), order))
    b = np.asarray(data)
    best = 1.0
    for lag in range(-24, 25):
        bs, rs = 24 + max(lag, 0), 24 + max(-lag, 0)
        n = min(len(b) - bs, len(d) - rs)
        if n > 0:
            best = min(best, float(np.mean(b[bs:bs + n] != d[rs:rs + n])))
    assert best < 0.02


def test_cli_fsk_tracking_flag(tmp_path):
    decim, sps, dev, center = 4, 8, 0.05, 0.11
    bits = random_bits(jax.random.PRNGKey(4), (1024,))
    bb = fsk_baseband(bits, decim * sps, dev / decim)
    x = np.asarray(bb * tone(bb.shape[-1], center))
    cap = str(tmp_path / "cap.cf32")
    write_capture(cap, x, CaptureMeta(fmt="cf32"))
    out = str(tmp_path / "bits.u8")
    cli_main(["fsk", cap, out, "--center", str(center), "--decim", str(decim),
              "--sps", str(sps), "--dev", str(dev), "--block", "8192",
              "--cutoff", "0.03", "--tracking"])
    rx = np.fromfile(out, np.uint8)
    b = np.asarray(bits)
    best = 1.0
    for lag in range(-32, 33):
        bs, rs = 64 + max(lag, 0), 64 + max(-lag, 0)
        n = min(len(b) - bs, len(rx) - rs)
        if n > 0:
            best = min(best, float(np.mean(b[bs:bs + n] != rx[rs:rs + n])))
    assert best < 0.01


def test_cli_fm_audio(tmp_path):
    """FM capture -> f32 audio file; the test tone survives the chain."""
    from srcdsp_tpu.chains.analog import fm_modulate
    import jax.numpy as jnp

    n = 1 << 16
    k = np.arange(n)
    audio = np.sin(2 * np.pi * 0.004 * k).astype(np.float32)
    x = np.asarray(fm_modulate(jnp.asarray(audio), dev=0.02, center=0.11))
    cap = str(tmp_path / "fm.cf32")
    write_capture(cap, x, CaptureMeta(fmt="cf32"))
    out = str(tmp_path / "audio.f32")
    cli_main(["fm", cap, out, "--center", "0.11", "--decim", "4",
              "--dev", "0.08", "--audio-decim", "2", "--block", "16384"])
    a = np.fromfile(out, np.float32)
    assert a.size == n // 8
    spec = np.abs(np.fft.rfft(a[256:] * np.hanning(a.size - 256)))
    pk = np.argmax(spec) / (a.size - 256)
    assert abs(pk - 0.004 * 8) < 1e-3


def test_cli_qam_symbols(tmp_path):
    """QAM capture -> u8 symbol indices matching the sent stream."""
    import jax.numpy as jnp
    from srcdsp_tpu.chains.qam import make_qam_params, qam_modulate
    from srcdsp_tpu.ops.resample import resample_full
    from srcdsp_tpu.testing.signals import tone as _tone

    order, decim, sps, center = 16, 2, 4, 0.13
    idx, sym = qam_modulate(jax.random.PRNGKey(3), 2048, order)
    params = make_qam_params(center, decim=decim, sps=sps, order=order)
    x = resample_full(params.taps, sym.astype(jnp.complex64),
                      up=decim * sps, down=1)
    x = np.asarray(x * _tone(x.shape[-1], center, phase0=0.05))
    cap = str(tmp_path / "qam.cf32")
    write_capture(cap, x, CaptureMeta(fmt="cf32"))
    out = str(tmp_path / "syms.u8")
    cli_main(["qam", cap, out, "--center", str(center), "--decim",
              str(decim), "--sps", str(sps), "--order", str(order),
              "--block", "4096"])
    rx = np.fromfile(out, np.uint8)
    b = np.asarray(idx)
    best = 1.0
    for lag in range(-16, 17):
        bs, rs = 32 + max(lag, 0), 32 + max(-lag, 0)
        n = min(len(b) - bs, len(rx) - rs)
        if n > 0:
            best = min(best, float(np.mean(b[bs:bs + n] != rx[rs:rs + n])))
    assert best < 0.01, best


def test_cli_dqpsk_roundtrip(tmp_path):
    from srcdsp_tpu.chains.dqpsk import dqpsk_baseband
    from srcdsp_tpu.metrics import align_sequences

    decim, sps, center = 4, 8, 0.11
    rng = np.random.default_rng(6)
    dibits = rng.integers(0, 4, 1024)
    bb = dqpsk_baseband(dibits, decim * sps)
    x = (np.asarray(bb) * np.asarray(tone(bb.shape[-1], center))
         ).astype(np.complex64)
    cap = str(tmp_path / "cap.cf32")
    write_capture(cap, x, CaptureMeta(fmt="cf32"))
    out = str(tmp_path / "dibits.u8")
    cli_main(["dqpsk", cap, out, "--center", str(center),
              "--decim", str(decim), "--sps", str(sps), "--block", "8192"])
    rx = np.fromfile(out, np.uint8)
    _, a, b = align_sequences(dibits, rx, max_lag=32)
    assert a.size > 900
    # skip the differential reference + timing convergence head
    assert np.mean(a[12:] != b[12:]) == 0.0


def test_cli_mod_psk_roundtrip(tmp_path):
    """tx driver -> rx driver through files: SER 0 after diff decode."""
    from srcdsp_tpu.chains.psk import diff_decode, diff_encode
    import jax.numpy as jnp

    order, decim, sps, center = 4, 2, 4, 0.17
    rng = np.random.default_rng(0)
    data = rng.integers(0, order, 768)
    tx_idx = np.asarray(diff_encode(jnp.asarray(data), order)).astype(np.uint8)
    symf = str(tmp_path / "syms.u8")
    tx_idx.tofile(symf)
    iq = str(tmp_path / "tx.cf32")
    cli_main(["mod", symf, iq, "--mod", "psk", "--order", str(order),
              "--sps", str(decim * sps), "--center", str(center),
              "--block", "2048"])
    out = str(tmp_path / "rx.u8")
    cli_main(["psk", iq, out, "--center", str(center), "--decim", str(decim),
              "--sps", str(sps), "--order", str(order), "--block", "4096"])
    rx = np.fromfile(out, np.uint8)
    d = np.asarray(diff_decode(jnp.asarray(rx.astype(np.int32)), order))
    best = 1.0
    for lag in range(0, 17):
        n = min(len(data) - 20, len(d) - 20 - lag)
        best = min(best, float(np.mean(data[20:20 + n] != d[20 + lag:20 + lag + n])))
    assert best == 0.0


def test_cli_mod_gmsk_roundtrip(tmp_path):
    decim, sps, center = 4, 8, 0.11
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 1024).astype(np.uint8)
    bitf = str(tmp_path / "bits.u8")
    bits.tofile(bitf)
    iq = str(tmp_path / "tx.cf32")
    cli_main(["mod", bitf, iq, "--mod", "gmsk", "--sps", str(decim * sps),
              "--center", str(center), "--block", "4096"])
    out = str(tmp_path / "rx.u8")
    cli_main(["fsk", iq, out, "--center", str(center), "--decim", str(decim),
              "--sps", str(sps), "--dev", str(0.25 / sps), "--cutoff", "0.1",
              "--timing-forget", "0.95", "--block", "8192"])
    rx = np.fromfile(out, np.uint8)
    best = 1.0
    for lag in range(-8, 17):
        bs, rs = 16 + max(lag, 0), 16 + max(-lag, 0)
        n = min(len(bits) - bs, len(rx) - rs)
        if n > 0:
            best = min(best, float(np.mean(bits[bs:bs + n] != rx[rs:rs + n])))
    assert best == 0.0


def test_cli_scan_survey(tmp_path):
    """Blind survey: mod a QPSK burst + add a tone, scan finds both and
    --analyze reports the right baud and order."""
    import json
    from srcdsp_tpu.testing.signals import np_tone

    rng = np.random.default_rng(2)
    syms = rng.integers(0, 4, 8192).astype(np.uint8)
    symf = str(tmp_path / "s.u8")
    syms.tofile(symf)
    iq = str(tmp_path / "tx.cf32")
    cli_main(["mod", symf, iq, "--mod", "psk", "--order", "4",
              "--sps", "8", "--center", "0.12"])
    x, _ = read_capture(iq)
    x = np.asarray(x) + 0.4 * np_tone(len(x), -0.3) \
        + 0.01 * (rng.standard_normal(len(x))
                  + 1j * rng.standard_normal(len(x))).astype(np.complex64)
    cap = str(tmp_path / "mix.cf32")
    write_capture(cap, x.astype(np.complex64), CaptureMeta(fmt="cf32"))
    out = str(tmp_path / "dets.jsonl")
    cli_main(["scan", cap, out, "--analyze"])
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) >= 2
    cents = sorted(r["center"] for r in recs[:2])
    np.testing.assert_allclose(cents, [-0.3, 0.12], atol=0.01)
    qpsk = min(recs, key=lambda r: abs(r["center"] - 0.12))
    assert abs(qpsk.get("baud", 0) - 1 / 8) < 2e-3, qpsk
    assert qpsk.get("psk_order") == 4, qpsk


def test_cli_mux_places_channels(tmp_path):
    """mux: per-channel narrowband captures land at their channel centers
    in the wideband output with the right powers (the transmit-multiplex
    use case; broadband NPR is the os2 bank's job, tested in
    test_channelizer_os2)."""
    from srcdsp_tpu.metrics import goertzel
    from srcdsp_tpu.testing.signals import np_tone

    m, k = 8, 4096
    amps = {1: 1.0, 3: 0.5, 6: 0.25}
    for c in range(m):
        a = amps.get(c, 0.0)
        x = (a * np_tone(k, 0.05) if a else np.zeros(k, np.complex64))
        write_capture(str(tmp_path / f"in.ch{c:03d}.cf32"), x,
                      CaptureMeta(fmt="cf32"))
    out = str(tmp_path / "wide.cf32")
    cli_main(["mux", str(tmp_path / "in"), out, "--channels", str(m),
              "--block", "8192"])
    y, meta = read_capture(out)
    y = np.asarray(y)[2048:]              # past the filter transient
    assert meta.num_samples == m * k
    for c in range(m):
        f = ((c + 0.05) / m + 0.5) % 1.0 - 0.5
        p = np.abs(goertzel(y, f)) ** 2
        a = amps.get(c, 0.0)
        if a:
            np.testing.assert_allclose(np.sqrt(p), a, rtol=0.05)
        else:
            assert p < 1e-4, (c, p)


def test_cli_resample(tmp_path):
    """3/4 rational resample through the file driver: a tone keeps its
    amplitude and lands at the scaled frequency."""
    from srcdsp_tpu.metrics import goertzel
    from srcdsp_tpu.testing.signals import np_tone

    x = np_tone(1 << 14, 0.05)
    cap = str(tmp_path / "in.cf32")
    write_capture(cap, x, CaptureMeta(fmt="cf32"))
    out = str(tmp_path / "out.cf32")
    cli_main(["resample", cap, out, "--up", "3", "--down", "4",
              "--taps", "96", "--block", "4096"])
    y, meta = read_capture(out)
    assert meta.num_samples == (1 << 14) * 3 // 4
    y = np.asarray(y)[512:]
    p = np.abs(goertzel(y, 0.05 * 4 / 3))
    np.testing.assert_allclose(p, 1.0, rtol=0.05)


def test_cli_fm_stereo(tmp_path):
    """FM broadcast with a stereo MPX program: --stereo separates L/R."""
    from srcdsp_tpu.chains.analog import fm_modulate, fm_stereo_mpx
    from srcdsp_tpu.metrics import tone_power_db

    decim, audio_decim, center = 4, 4, 0.07
    fp = 19.0 / 240.0                              # at the MPX (decim) rate
    n = 1 << 17                                    # input-rate samples
    k = np.arange(n)
    # program generated at the INPUT rate (frequencies /decim), so the
    # chain's decimator lands the pilot at fp in MPX cycles/sample
    left = 0.7 * np.cos(2 * np.pi * 0.004 / decim * k)
    right = 0.7 * np.cos(2 * np.pi * 0.0065 / decim * k)
    mpx_in = fm_stereo_mpx(left, right, fp / decim)
    dev_in = 0.02
    iq = np.asarray(fm_modulate(np.asarray(mpx_in), dev=dev_in,
                                center=center))
    cap = str(tmp_path / "fm.cf32")
    write_capture(cap, iq.astype(np.complex64), CaptureMeta(fmt="cf32"))
    out = str(tmp_path / "st.f32")
    cli_main(["fm", cap, out, "--stereo", "--center", str(center),
              "--decim", str(decim), "--dev", str(dev_in * decim),
              "--audio-decim", str(audio_decim), "--taps", "96",
              "--block", "65536"])
    lr = np.fromfile(out, np.float32).reshape(-1, 2)[256:]
    l_ch, r_ch = lr[:, 0], lr[:, 1]
    f1, f2 = 0.004 * audio_decim, 0.0065 * audio_decim
    assert tone_power_db(l_ch, f1) - tone_power_db(l_ch, f2) > 15.0
    assert tone_power_db(r_ch, f2) - tone_power_db(r_ch, f1) > 15.0


def test_cli_gen(tmp_path):
    from srcdsp_tpu.metrics import tone_power_db

    out = str(tmp_path / "t.cu8")
    cli_main(["gen", out, "--gen", "tone", "--center", "0.11",
              "--num-samples", "8192", "--snr", "20", "--fmt", "cu8"])
    y, meta = read_capture(out)
    assert meta.fmt == "cu8" and meta.num_samples == 8192
    assert tone_power_db(np.asarray(y), 0.11) > -1.5   # tone dominates

    out2 = str(tmp_path / "c.cf32")
    cli_main(["gen", out2, "--gen", "chirp", "--f0", "-0.1", "--f1", "0.1",
              "--num-samples", "4096"])
    y2, _ = read_capture(out2)
    np.testing.assert_allclose(np.abs(np.asarray(y2)), 1.0, atol=1e-5)


def test_cli_fec_roundtrips(tmp_path):
    """fecenc/fecdec file drivers: exact roundtrip for all three code
    families (hard-decision input path)."""
    import numpy as np
    from srcdsp_tpu.cli import main as cli_main

    u = np.random.default_rng(0).integers(0, 2, 600).astype(np.uint8)
    info = tmp_path / "info.u8"
    u.tofile(info)
    for code, extra in (("ldpc", ["--fec-n", "120"]),
                        ("polar", ["--fec-n", "128", "--fec-k", "64"]),
                        ("turbo", ["--fec-k", "64", "--fec-iters", "4"])):
        coded = tmp_path / f"c_{code}.u8"
        dec = tmp_path / f"d_{code}.u8"
        cli_main(["fecenc", str(info), str(coded), "--code", code,
                  "--platform", "cpu"] + extra)
        cli_main(["fecdec", str(coded), str(dec), "--code", code, "--hard",
                  "--platform", "cpu"] + extra)
        d = np.fromfile(dec, np.uint8)
        np.testing.assert_array_equal(d[:u.size], u)


def test_cli_scf_cycle_lines(tmp_path):
    """Cyclostationary survey: a modded BPSK burst shows its baud line in
    the standard SCF and its 2fc line in the conjugate SCF."""
    import json

    rng = np.random.default_rng(3)
    syms = rng.integers(0, 2, 8192).astype(np.uint8)
    symf = str(tmp_path / "s.u8")
    syms.tofile(symf)
    iq = str(tmp_path / "tx.cf32")
    cli_main(["mod", symf, iq, "--mod", "psk", "--order", "2",
              "--sps", "8", "--center", "0.12"])

    out = str(tmp_path / "lines.jsonl")
    # the standard-SCF baud line's strength is ~beta/2-ish of the PSD
    # peak (~0.32 for the mod driver's RRC beta=0.35): threshold below it
    cli_main(["scf", iq, out, "--scf-thresh", "0.3"])
    recs = [json.loads(l) for l in open(out)]
    assert recs, "no cycle lines on a BPSK capture"
    assert min(abs(abs(r["alpha"]) - 1 / 8) for r in recs) < 2e-3, recs

    outc = str(tmp_path / "conj.jsonl")
    cli_main(["scf", iq, outc, "--conj"])
    recs = [json.loads(l) for l in open(outc)]
    assert recs, "no conjugate lines on a BPSK capture"
    assert min(abs(r["alpha"] - 2 * 0.12) for r in recs) < 2e-3, recs


def test_cli_fec_conv_and_rs_roundtrip(tmp_path):
    """fecenc/fecdec conv (K=7 Viterbi, bit errors) and rs (byte
    errors) file roundtrips."""
    rng = np.random.default_rng(9)
    bits = rng.integers(0, 2, 512).astype(np.uint8)
    bf = str(tmp_path / "u.u8")
    bits.tofile(bf)
    cf = str(tmp_path / "c.u8")
    cli_main(["fecenc", bf, cf, "--code", "conv"])
    c = np.fromfile(cf, np.uint8)
    c[::97] ^= 1
    cn = str(tmp_path / "cn.u8")
    c.tofile(cn)
    df = str(tmp_path / "d.u8")
    cli_main(["fecdec", cn, df, "--code", "conv", "--hard"])
    assert np.array_equal(np.fromfile(df, np.uint8)[:512], bits)

    msg = rng.integers(0, 256, 300).astype(np.uint8)
    mf = str(tmp_path / "m.u8")
    msg.tofile(mf)
    rcf = str(tmp_path / "rc.u8")
    cli_main(["fecenc", mf, rcf, "--code", "rs"])
    r = np.fromfile(rcf, np.uint8).copy()
    r[5:20] ^= 0x5A
    rnf = str(tmp_path / "rn.u8")
    r.tofile(rnf)
    rdf = str(tmp_path / "rd.u8")
    cli_main(["fecdec", rnf, rdf, "--code", "rs"])
    assert np.array_equal(np.fromfile(rdf, np.uint8)[:300], msg)


def test_cli_adsb_decodes_frames(tmp_path):
    """adsb subcommand: two Mode S frames in a noisy IQ capture come out
    as CRC-clean hex JSON lines."""
    import json
    from srcdsp_tpu.chains.adsb import build_frame, modulate

    rng = np.random.default_rng(6)
    sps = 2
    frames = [build_frame(rng.integers(0, 2, 88).astype(np.int32))
              for _ in range(2)]
    cap = (0.06 * (rng.standard_normal(12000)
                   + 1j * rng.standard_normal(12000))).astype(np.complex64)
    offs = [1500, 7000]
    for f, off in zip(frames, offs):
        w = modulate(f, sps_half=sps)
        cap[off: off + w.size] += w.astype(np.complex64)
    capf = str(tmp_path / "es.cf32")
    write_capture(capf, cap, CaptureMeta(fmt="cf32"))
    out = str(tmp_path / "frames.jsonl")
    cli_main(["adsb", capf, out, "--sps-half", str(sps)])
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 2
    for rec, f, off in zip(recs, frames, offs):
        assert rec["start"] == off
        assert bytes.fromhex(rec["hex"]) == np.packbits(
            f.reshape(-1, 8)).tobytes()


def test_cli_rds_decodes_groups(tmp_path):
    """rds subcommand: FM IQ capture with stereo + RDS -> group JSON."""
    import json
    import jax.numpy as jnp
    from srcdsp_tpu.chains.analog import fm_modulate, fm_stereo_mpx
    from srcdsp_tpu.chains.rds import rds_encode_group, rds_inject_mpx

    fs = 228000.0
    f_pilot = 19000.0 / fs
    sps_half = 96
    rng = np.random.default_rng(8)
    words = [rng.integers(0, 1 << 16, 4).tolist() for _ in range(2)]
    bits = np.concatenate(
        [rds_encode_group(w, "A") for w in words]).astype(np.int32)
    n = bits.size * 2 * sps_half + 8000
    t = np.arange(n)
    mpx = fm_stereo_mpx(0.3 * np.sin(2 * np.pi * 1000 / fs * t),
                        0.3 * np.sin(2 * np.pi * 2500 / fs * t), f_pilot)
    mpx = rds_inject_mpx(mpx, bits, f_pilot, sps_half, level=0.07)
    iq = np.asarray(fm_modulate(jnp.asarray(mpx), 0.3)).astype(np.complex64)
    capf = str(tmp_path / "fm.cf32")
    write_capture(capf, iq, CaptureMeta(fmt="cf32"))
    out = str(tmp_path / "groups.jsonl")
    cli_main(["rds", capf, out, "--sps-half", str(sps_half),
              "--pilot", str(f_pilot), "--dev", "0.3"])
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) >= 2
    assert [[int(w, 16) for w in r["words"]] for r in recs[:2]] == [
        [int(w) for w in ws] for ws in words]


def test_cli_gps_acquires_prn(tmp_path):
    """gps subcommand: buried C/A signal -> the right PRN's JSON line,
    absent PRNs silent."""
    import json
    from srcdsp_tpu.chains.gps import ca_code, sample_ca

    prn, sps, nb = 9, 2, 6
    n1 = 1023 * sps
    rng = np.random.default_rng(9)
    base = np.roll(sample_ca(ca_code(prn), sps), 404)
    chips = np.tile(base, nb)
    t = np.arange(nb * n1)
    truef = 4.0 / (2 * n1)
    x = chips * np.exp(2j * np.pi * truef * t)
    x = (x + np.sqrt(50.0) * (rng.standard_normal(x.shape)
                              + 1j * rng.standard_normal(x.shape))
         ).astype(np.complex64)
    capf = str(tmp_path / "gps.cf32")
    write_capture(capf, x, CaptureMeta(fmt="cf32"))
    out = str(tmp_path / "acq.jsonl")
    cli_main(["gps", capf, out, "--sps", str(sps), "--prn", str(prn)])
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 1
    assert recs[0]["prn"] == prn
    assert abs(recs[0]["code_phase_samples"] - 404) < 1.0
    # absent PRN produces nothing
    out2 = str(tmp_path / "acq2.jsonl")
    cli_main(["gps", capf, out2, "--sps", str(sps), "--prn", "20"])
    assert [l for l in open(out2)] == []


def test_cli_scan_flags_css_band(tmp_path):
    """A CSS burst inside a band: scan --analyze reports css_sf."""
    import json

    import numpy as np

    from srcdsp_tpu.chains import css
    from srcdsp_tpu.testing.signals import np_tone

    rng = np.random.default_rng(3)
    p = css.make_css_params(sf=7)
    sig = css.css_modulate(p, rng.integers(0, p.n, 200))
    # oversample 8x (chip rate = bandwidth = 1/8): repeat + lowpass,
    # then mix up to the band center — a realistic capture geometry
    import jax.numpy as jnp

    from srcdsp_tpu.ops.fir import fir_full
    from srcdsp_tpu.ops.window import lowpass as lp
    up = np.repeat(sig, 8)
    up = np.asarray(fir_full(jnp.asarray(lp(97, 0.08)),
                             jnp.asarray(up)))
    x = (up * np_tone(up.size, 0.18)).astype(np.complex64)
    x = x + (0.05 * (rng.standard_normal(x.size)
                     + 1j * rng.standard_normal(x.size))
             ).astype(np.complex64)
    cap = str(tmp_path / "css_band.cf32")
    write_capture(cap, x, CaptureMeta(fmt="cf32"))
    out = str(tmp_path / "scan.jsonl")
    cli_main(["scan", cap, out, "--analyze"])
    recs = [json.loads(line) for line in open(out)]
    hit = [r for r in recs if "css_chirp_rate" in r]
    assert hit, recs
    # the chirp-rate INVARIANT identifies the signal regardless of the
    # (sf, decim) factorization the sweep happened to win with:
    # true rate = (1/8) / (2^7 * 8) = 2^-13
    assert abs(hit[0]["css_chirp_rate"] - 2.0 ** -13) < 2.0 ** -15
    assert abs(hit[0]["center"] - 0.18) < 0.02
