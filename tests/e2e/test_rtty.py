"""RTTY / async framing: UART deframer properties, ITA2 shift logic
vs published spot values, and the full FSK link."""

import numpy as np

from srcdsp_tpu.chains import rtty


def test_ita2_published_spot_values():
    # published ITA2 control points: LTRS=0x1F, FIGS=0x1B, space=0x04,
    # CR=0x08, LF=0x02, E=0x01, T=0x10, A=0x03
    assert rtty.LTRS == 0x1F and rtty.FIGS == 0x1B
    assert rtty._ITA2_LTRS[0x04] == " " and rtty._ITA2_LTRS[0x08] == "\r"
    assert rtty._ITA2_LTRS[0x02] == "\n" and rtty._ITA2_LTRS[0x01] == "E"
    assert rtty._ITA2_LTRS[0x10] == "T" and rtty._ITA2_LTRS[0x03] == "A"
    # figures ride the same codes: '3' over E, '5' over T
    assert rtty._ITA2_FIGS[0x01] == "3" and rtty._ITA2_FIGS[0x10] == "5"


def test_ita2_shift_round_trip():
    text = "CQ CQ DE N0CALL 599 73"
    codes = rtty.ita2_encode(text)
    assert rtty.ita2_decode(codes) == text
    # shifts inserted exactly at letter<->figure boundaries
    assert codes.count(rtty.FIGS) == 2 and codes[0] == rtty.LTRS


def test_uart_deframe_generic_and_resync():
    # generic width: 8-data-bit async bytes
    chars = [0x55, 0x00, 0xFF, 0xA7]
    lv = rtty.uart_frame(chars, data_bits=8, stop_bits=2.0)
    got = rtty.uart_deframe(lv, data_bits=8, stop_bits=2.0)
    np.testing.assert_array_equal(got, chars)
    # a corrupted stretch before the frame: the per-char start-edge
    # sync recovers every character after the junk
    junk = np.asarray([0, 1, 0, 0, 1, 0, 1] * 3, np.int32)
    got = rtty.uart_deframe(np.concatenate([junk, lv]),
                            data_bits=8, stop_bits=2.0)
    assert list(got[-4:]) == chars


def test_rtty_fsk_link(rng):
    text = "THE QUICK BROWN FOX 1234567890"
    lv = rtty.uart_frame(rtty.ita2_encode(text))
    x = rtty.rtty_modulate(lv, sps_half=10, dev=0.04)
    x = np.concatenate([x, np.ones(200, np.complex64)])
    x = x + (0.1 * (rng.standard_normal(x.size)
                    + 1j * rng.standard_normal(x.size))
             ).astype(np.complex64)
    got = rtty.decode_rtty(x, sps_half=10, dev=0.04)
    assert text in got


def test_cli_rtty(rng, tmp_path):
    from srcdsp_tpu.cli import main as cli_main
    from srcdsp_tpu.io.capture import CaptureMeta, write_capture

    text = "RYRYRY DE CLI TEST"
    lv = rtty.uart_frame(rtty.ita2_encode(text))
    x = rtty.rtty_modulate(lv, sps_half=10, dev=0.04)
    capf = str(tmp_path / "rtty.cf32")
    write_capture(capf, np.concatenate([x, np.ones(100, np.complex64)]),
                  CaptureMeta(fmt="cf32"))
    out = str(tmp_path / "rtty.txt")
    cli_main(["rtty", capf, out, "--sps", "10", "--dev", "0.04"])
    assert text in open(out).read()
