"""Polar codes (polar.py): construction, kron-power encode twin, SC
decoding under AWGN, batch vmap."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.polar import make_polar, polar_decode, polar_encode


def _kron_g(n):
    f = np.array([[1, 0], [1, 1]])
    g = np.array([[1]])
    while g.shape[0] < n:
        g = np.kron(f, g)
    return g


def test_construction_and_encode_twin():
    code = make_polar(64, 32)
    assert code.frozen.sum() == 32 and code.data_pos.size == 32
    # the most reliable synthetic channel (index N-1) always carries data
    assert not code.frozen[63]
    assert code.frozen[0]                       # the worst is frozen
    rng = np.random.default_rng(0)
    u = rng.integers(0, 2, (4, 32))
    x = np.asarray(polar_encode(code, jnp.asarray(u)))
    ufull = np.zeros((4, 64), int)
    ufull[:, code.data_pos] = u
    np.testing.assert_array_equal(x, (ufull @ _kron_g(64)) % 2)


def test_clean_roundtrip():
    code = make_polar(128, 64)
    rng = np.random.default_rng(1)
    u = rng.integers(0, 2, 64)
    x = np.asarray(polar_encode(code, jnp.asarray(u)))
    info, uhat = jax.jit(lambda l: polar_decode(code, l))(
        jnp.asarray(4.0 * (1 - 2.0 * x), jnp.float32))
    np.testing.assert_array_equal(np.asarray(info), u)
    # frozen positions decode to 0 by construction
    assert np.asarray(uhat)[code.frozen].sum() == 0


def test_sc_corrects_awgn():
    """Polar(256,128) SC at 2.5 dB Eb/N0: hard decisions carry errors on
    every block, SC decodes most blocks exactly."""
    code = make_polar(256, 128)
    rate = code.k / code.n
    rng = np.random.default_rng(2)
    nblk = 32
    u = rng.integers(0, 2, (nblk, code.k))
    x = np.asarray(polar_encode(code, jnp.asarray(u))).astype(np.float64)
    sigma = np.sqrt(1.0 / (2 * rate * 10 ** (2.5 / 10)))
    y = (1 - 2 * x) + sigma * rng.standard_normal(x.shape)
    hard_errs = int(((y < 0) != (x > 0.5)).sum())
    assert hard_errs > nblk              # channel noisy on every block
    llr = jnp.asarray(2 / sigma ** 2 * y, jnp.float32)
    dec = jax.jit(jax.vmap(lambda l: polar_decode(code, l)))
    info, _ = dec(llr)
    ok_blocks = int((np.asarray(info) == u).all(axis=-1).sum())
    assert ok_blocks >= int(0.8 * nblk), ok_blocks


def test_invalid_params_raise():
    import pytest
    with pytest.raises(ValueError):
        make_polar(100, 50)              # not a power of two
    with pytest.raises(ValueError):
        make_polar(64, 64)


def test_scl_list_contains_truth_and_beats_sc():
    """SCL-8 at 2 dB: best-path >= SC, and the TRUE codeword is in the
    list for every block (the property CRC-aided selection exploits)."""
    from srcdsp_tpu.polar import polar_decode_list

    code = make_polar(256, 128)
    rng = np.random.default_rng(0)
    nblk = 32
    u = rng.integers(0, 2, (nblk, code.k))
    x = np.asarray(polar_encode(code, jnp.asarray(u))).astype(np.float64)
    sigma = np.sqrt(1.0 / (2 * 0.5 * 10 ** (2.0 / 10)))
    y = (1 - 2 * x) + sigma * rng.standard_normal(x.shape)
    llr = jnp.asarray(2 / sigma ** 2 * y, jnp.float32)
    sc_info, _ = jax.vmap(lambda l: polar_decode(code, l))(llr)
    sc_ok = int((np.asarray(sc_info) == u).all(axis=-1).sum())
    l_info, _, pm = jax.vmap(
        lambda l: polar_decode_list(code, l, 8))(llr)
    l_info = np.asarray(l_info)
    best_ok = int((l_info[:, 0] == u).all(axis=-1).sum())
    genie_ok = int(((l_info == u[:, None, :]).all(axis=-1)).any(axis=-1)
                   .sum())
    assert best_ok >= sc_ok, (best_ok, sc_ok)
    assert genie_ok == nblk, genie_ok
    # path metrics come out ascending
    pm0 = np.asarray(pm)[0]
    assert (np.diff(pm0) >= -1e-3).all()


def test_crc_aided_scl():
    """CA-SCL (the 5G construct): CRC-8 appended to the payload selects
    the right path from the list — block success well above plain SC at
    the same Eb/N0."""
    from srcdsp_tpu.gf2 import crc_init, crc_update, crc_value, make_crc
    from srcdsp_tpu.polar import polar_decode_list

    code = make_polar(256, 128)                   # K = 120 payload + 8 CRC
    crc = make_crc(0x07, 8)                       # CRC-8
    rng = np.random.default_rng(1)
    nblk = 24
    sigma = np.sqrt(1.0 / (2 * 0.5 * 10 ** (2.0 / 10)))
    sc_ok = ca_ok = 0
    dec_sc = jax.jit(lambda l: polar_decode(code, l))
    dec_l = jax.jit(lambda l: polar_decode_list(code, l, 8))
    for b in range(nblk):
        payload = rng.integers(0, 2, 120)
        cval = int(crc_value(crc, crc_update(crc, crc_init(crc),
                                             jnp.asarray(payload))))
        bits = np.concatenate([payload,
                               [(cval >> (7 - i)) & 1 for i in range(8)]])
        x = np.asarray(polar_encode(code, jnp.asarray(bits))
                       ).astype(np.float64)
        y = (1 - 2 * x) + sigma * rng.standard_normal(x.shape)
        llr = jnp.asarray(2 / sigma ** 2 * y, jnp.float32)
        sc_info, _ = dec_sc(llr)
        sc_ok += int((np.asarray(sc_info) == bits).all())
        l_info, _, _ = dec_l(llr)
        l_info = np.asarray(l_info)
        for row in l_info:                        # first CRC-passing path
            rv = int(crc_value(crc, crc_update(crc, crc_init(crc),
                                               jnp.asarray(row[:120]))))
            want = int(sum(bb << (7 - i) for i, bb in enumerate(row[120:])))
            if rv == want:
                ca_ok += int((row == bits).all())
                break
    assert ca_ok > sc_ok, (ca_ok, sc_ok)
    assert ca_ok >= int(0.9 * nblk), (ca_ok, nblk)


def test_onehot_scl_bit_identical_to_gather_form():
    from srcdsp_tpu.polar import polar_decode_list, polar_decode_list_onehot
    code = make_polar(128, 64)
    rng = np.random.default_rng(3)
    for trial in range(3):
        llr = jnp.asarray(rng.standard_normal(128) * 3, jnp.float32)
        i1, u1, p1 = polar_decode_list(code, llr, list_size=8)
        i2, u2, p2 = polar_decode_list_onehot(code, llr, list_size=8)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_onehot_scl_vmap_batch():
    from srcdsp_tpu.polar import polar_decode_list_onehot
    code = make_polar(128, 64)
    rng = np.random.default_rng(4)
    u = rng.integers(0, 2, (8, code.k))
    cw = np.asarray(polar_encode(code, jnp.asarray(u)))
    llr = jnp.asarray(6.0 * (1.0 - 2.0 * cw)
                      + 0.5 * rng.standard_normal(cw.shape), jnp.float32)
    info = jax.vmap(lambda l: polar_decode_list_onehot(code, l, 4)[0][0])(llr)
    np.testing.assert_array_equal(np.asarray(info), u)


def test_onehot_scl_fast_bit_identical():
    """fast=True (rate-0/REP subtree shortcuts) must be bit-identical to
    the plain one-hot SCL: info, u_hat, AND path metrics."""
    from srcdsp_tpu.polar import polar_decode_list_onehot
    code = make_polar(256, 128)
    rng = np.random.default_rng(5)
    u = rng.integers(0, 2, (8, code.k))
    cw = np.asarray(polar_encode(code, jnp.asarray(u)))
    llr = jnp.asarray((1.0 - 2.0 * cw) * 2.0
                      + 0.9 * rng.standard_normal(cw.shape), jnp.float32)
    slow = jax.vmap(lambda l: polar_decode_list_onehot(code, l, 8))(llr)
    fast = jax.vmap(
        lambda l: polar_decode_list_onehot(code, l, 8, fast=True))(llr)
    for a, b in zip(slow, fast):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
