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
    decim, sps, dev, center = 4, 8, 0.05, 0.11
    bits = random_bits(jax.random.PRNGKey(1), (2048,))
    bb = fsk_baseband(bits, decim * sps, dev / decim)
    x = np.asarray(bb * tone(bb.shape[-1], center))
    cap = str(tmp_path / "cap.cf32")
    write_capture(cap, x, CaptureMeta(fmt="cf32"))
    ck = str(tmp_path / "ck")
    out1 = str(tmp_path / "a.u8")
    cli_main(["fsk", cap, out1, "--center", str(center), "--block", "8192",
              "--cutoff", "0.03", "--ckpt", ck, "--ckpt-every", "3"])
    # resume run picks up from the last checkpoint and produces the tail
    out2 = str(tmp_path / "b.u8")
    cli_main(["fsk", cap, out2, "--center", str(center), "--block", "8192",
              "--cutoff", "0.03", "--ckpt", ck, "--ckpt-every", "3"])
    a = np.fromfile(out1, np.uint8)
    b = np.fromfile(out2, np.uint8)
    assert len(b) > 0 and np.array_equal(a[-len(b):], b)


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
