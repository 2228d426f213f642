"""RDS (chains/rds.py): checkword vs an independent long-division twin,
syndrome == offset identity, single-bit correction, stream sync, and
the full MPX (stereo + RDS + noise) -> pilot-cubed coherent demod ->
group decode round trip."""

import numpy as np

import jax.numpy as jnp

from srcdsp_tpu.chains.rds import (OFFSETS, rds_checkword,
                                   rds_encode_group, rds_inject_mpx,
                                   rds_demod_mpx, rds_sync_decode,
                                   rds_syndromes)


def _checkword_twin(info: int) -> int:
    """Independent twin: shift-register long division of m(x)*x^10 by
    g(x) = x^10+x^8+x^7+x^5+x^4+x^3+1 using python ints MSB-down."""
    g = (1 << 10) | 0x1B9
    r = info << 10
    for k in range(25, 9, -1):
        if r & (1 << k):
            r ^= g << (k - 10)
    return r


def test_checkword_matches_long_division_twin():
    rng = np.random.default_rng(0)
    for info in [0, 1, 0xFFFF, *rng.integers(0, 1 << 16, 32).tolist()]:
        assert rds_checkword(int(info)) == _checkword_twin(int(info)), info


def test_syndrome_equals_offset_and_single_bit_correction():
    rng = np.random.default_rng(1)
    words = rng.integers(0, 1 << 16, 4).tolist()
    for version, cseq in (("A", "C"), ("B", "Cp")):
        bits = rds_encode_group(words, version=version)
        syn = rds_syndromes(bits)
        for blk, off in enumerate(["A", "B", cseq, "D"]):
            assert syn[blk * 26] == OFFSETS[off], (version, blk)
        # any single flipped bit is corrected
        for pos in (0, 15, 16, 25, 40, 103):
            bad = bits.copy()
            bad[pos] ^= 1
            gs = rds_sync_decode(bad)
            assert len(gs) == 1
            assert gs[0]["words"] == [int(w) for w in words]
            assert gs[0]["version"] == version
            assert gs[0]["corrected"] == 1


def test_stream_sync_finds_groups_at_any_offset():
    rng = np.random.default_rng(2)
    words1 = rng.integers(0, 1 << 16, 4).tolist()
    words2 = rng.integers(0, 1 << 16, 4).tolist()
    stream = np.concatenate([
        rng.integers(0, 2, 37),                  # junk prefix
        rds_encode_group(words1, "A"),
        rds_encode_group(words2, "B"),
        rng.integers(0, 2, 20),
    ]).astype(np.int32)
    gs = rds_sync_decode(stream)
    assert len(gs) == 2
    assert gs[0]["words"] == [int(w) for w in words1]
    assert gs[0]["version"] == "A"
    assert gs[0]["start"] == 37
    assert gs[1]["words"] == [int(w) for w in words2]
    assert gs[1]["version"] == "B"


def test_rds_over_mpx_round_trip():
    """Stereo MPX + RDS subcarrier + noise -> coherent demod via the
    cubed analytic pilot -> all groups recovered (delay/polarity
    ambiguities absorbed by differential coding + block sync)."""
    from srcdsp_tpu.chains.analog import fm_stereo_mpx

    fs = 228000.0
    f_pilot = 19000.0 / fs
    sps_half = 96                                # 2375 half-bits/s
    rng = np.random.default_rng(3)
    words = [rng.integers(0, 1 << 16, 4).tolist() for _ in range(3)]
    bits = np.concatenate(
        [rds_encode_group(w, v) for w, v in
         zip(words, ("A", "B", "A"))]).astype(np.int32)
    n = bits.size * 2 * sps_half + 8000
    t = np.arange(n)
    left = 0.4 * np.sin(2 * np.pi * 1100.0 / fs * t)
    right = 0.4 * np.sin(2 * np.pi * 2700.0 / fs * t)
    mpx = fm_stereo_mpx(left, right, f_pilot)
    mpx = rds_inject_mpx(mpx, bits, f_pilot, sps_half, level=0.06)
    mpx = (mpx + 0.01 * rng.standard_normal(n).astype(np.float32)
           ).astype(np.float32)

    got = rds_demod_mpx(jnp.asarray(mpx), f_pilot, sps_half)
    gs = rds_sync_decode(got)
    assert len(gs) >= 3, len(gs)
    assert [g["words"] for g in gs[:3]] == [
        [int(w) for w in ws] for ws in words]
    assert [g["version"] for g in gs[:3]] == ["A", "B", "A"]


def test_rds_full_fm_iq_round_trip():
    """The broadcast path end-to-end at IQ: MPX (stereo + RDS) ->
    fm_modulate -> AWGN channel -> discriminator -> MPX -> RDS groups."""
    import jax
    from srcdsp_tpu.chains.analog import fm_modulate, fm_stereo_mpx
    from srcdsp_tpu.chains.fsk import discriminate

    fs = 228000.0
    f_pilot = 19000.0 / fs
    sps_half = 96
    rng = np.random.default_rng(5)
    words = [rng.integers(0, 1 << 16, 4).tolist() for _ in range(2)]
    bits = np.concatenate(
        [rds_encode_group(w, "A") for w in words]).astype(np.int32)
    n = bits.size * 2 * sps_half + 8000
    t = np.arange(n)
    left = 0.3 * np.sin(2 * np.pi * 900.0 / fs * t)
    right = 0.3 * np.sin(2 * np.pi * 3100.0 / fs * t)
    mpx = fm_stereo_mpx(left, right, f_pilot)
    mpx = rds_inject_mpx(mpx, bits, f_pilot, sps_half, level=0.07)

    dev = 0.3
    iq = np.asarray(fm_modulate(jnp.asarray(mpx), dev))
    iq = iq + 0.005 * (rng.standard_normal(n)
                       + 1j * rng.standard_normal(n))
    last = jnp.zeros((1,), jnp.complex64)
    _, d = jax.jit(discriminate)(last, jnp.asarray(
        iq.astype(np.complex64)))
    mpx_rx = np.asarray(d) / dev

    got = rds_demod_mpx(jnp.asarray(mpx_rx.astype(np.float32)),
                        f_pilot, sps_half)
    gs = rds_sync_decode(got)
    assert len(gs) >= 2
    assert [g["words"] for g in gs[:2]] == [
        [int(w) for w in ws] for ws in words]
