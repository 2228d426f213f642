"""IQ capture I/O tests (SURVEY.md C11)."""

import numpy as np
import pytest

from srcdsp_tpu.io.capture import CaptureMeta, read_capture, read_capture_blocks, write_capture


@pytest.fixture
def x(rng):
    return (rng.standard_normal(1000) * 0.3
            + 1j * rng.standard_normal(1000) * 0.3).astype(np.complex64)


def test_cf32_roundtrip_exact(tmp_path, x):
    p = str(tmp_path / "a.cf32")
    write_capture(p, x, CaptureMeta(fmt="cf32", sample_rate=2e6))
    y, meta = read_capture(p)
    np.testing.assert_array_equal(x, y)
    assert meta.sample_rate == 2e6 and meta.num_samples == 1000


def test_ci16_roundtrip_quantized(tmp_path, x):
    x = np.clip(x.real, -0.99, 0.99) + 1j * np.clip(x.imag, -0.99, 0.99)
    x = x.astype(np.complex64)
    p = str(tmp_path / "a.ci16")
    write_capture(p, x, CaptureMeta(fmt="ci16"))
    y, meta = read_capture(p)
    assert meta.fmt == "ci16"
    # quantization error bounded by half an LSB per component
    assert np.max(np.abs(x.real - y.real)) <= 0.5 / 32767 + 1e-9
    assert np.max(np.abs(x.imag - y.imag)) <= 0.5 / 32767 + 1e-9


def test_ci16_saturation(tmp_path):
    x = np.asarray([3.0 - 3.0j, -2.0 + 0.5j], np.complex64)
    p = str(tmp_path / "s.ci16")
    write_capture(p, x)
    y, _ = read_capture(p)
    np.testing.assert_allclose(y[0], 32767 / 32767 - 1j * 32768 / 32767, atol=1e-7)
    np.testing.assert_allclose(y[1], -32768 / 32767 + 0.5j, atol=1e-4)


def test_no_sidecar_defaults_ci16(tmp_path, x):
    p = str(tmp_path / "bare.iq")
    write_capture(p, x)
    import os
    os.remove(p + ".json")
    y, meta = read_capture(p)
    assert meta.fmt == "ci16" and meta.num_samples == 1000


def test_block_reader_and_resume(tmp_path, x):
    p = str(tmp_path / "b.cf32")
    write_capture(p, x, CaptureMeta(fmt="cf32"))
    blocks = list(read_capture_blocks(p, 256))
    assert len(blocks) == 3  # 1000 // 256, trailing partial dropped
    np.testing.assert_array_equal(np.concatenate(blocks), x[:768])
    resumed = list(read_capture_blocks(p, 256, start_block=2))
    np.testing.assert_array_equal(resumed[0], x[512:768])


def test_device_blocks_sharded(tmp_path, x):
    """device_blocks: memmap -> device_put, optional NamedSharding + planes."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from srcdsp_tpu.dist.mesh import make_mesh
    from srcdsp_tpu.io.capture import device_blocks

    p = str(tmp_path / "d.cf32")
    write_capture(p, x, CaptureMeta(fmt="cf32"))
    blocks = list(device_blocks(p, 256))
    assert len(blocks) == 3 and isinstance(blocks[0], jax.Array)
    np.testing.assert_array_equal(np.asarray(blocks[1]), x[256:512])

    mesh = make_mesh(time=8)
    sh = NamedSharding(mesh, P(None, "time"))
    planes = list(device_blocks(p, 256, sharding=sh, planes=True))
    assert planes[0].shape == (2, 256) and planes[0].dtype == np.float32
    assert planes[0].sharding == sh
    np.testing.assert_array_equal(np.asarray(planes[0][0]), x[:256].real)


def test_cu8_ci8_roundtrip(tmp_path):
    """rtl-sdr (cu8 offset-binary) and HackRF (ci8) wire formats."""
    from srcdsp_tpu.io.capture import (
        CaptureMeta, read_capture, read_capture_blocks, write_capture)
    rng = np.random.default_rng(0)
    x = ((rng.standard_normal(1024) + 1j * rng.standard_normal(1024)) / 4
         ).astype(np.complex64)
    for fmt, step in (("cu8", 1 / 127.5), ("ci8", 1 / 127.0)):
        p = str(tmp_path / f"cap.{fmt}")
        write_capture(p, x, CaptureMeta(fmt=fmt))
        import os
        assert os.path.getsize(p) == 2 * 1024      # 2 bytes/sample
        y, meta = read_capture(p)
        assert meta.fmt == fmt
        np.testing.assert_allclose(y, x, atol=step * 0.75)  # |c| err <= step/sqrt(2)
        blocks = list(read_capture_blocks(p, 256))
        np.testing.assert_array_equal(np.concatenate(blocks), y)


def test_cu8_saturates(tmp_path):
    from srcdsp_tpu.io.capture import CaptureMeta, read_capture, write_capture
    x = np.asarray([2.0 + 2.0j, -2.0 - 2.0j, 0.0], np.complex64)
    p = str(tmp_path / "sat.cu8")
    write_capture(p, x, CaptureMeta(fmt="cu8"))
    raw = np.fromfile(p, np.uint8)
    np.testing.assert_array_equal(raw[:4], [255, 255, 0, 0])
    y, _ = read_capture(p)
    np.testing.assert_allclose(y[2], 0.0, atol=0.006)  # 127.5 offset straddles
