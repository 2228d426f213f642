"""QC-LDPC construction and layered min-sum (qcldpc.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srcdsp_tpu.ldpc import ldpc_decode, ldpc_encode
from srcdsp_tpu.qcldpc import (
    ldpc_decode_layered, make_qc_base, make_qc_ldpc, qc_expand,
)


def test_qc_expand_structure():
    base = np.asarray([[0, 1, 2], [-1, 3, 0]])
    z = 4
    h = qc_expand(base, z)
    assert h.shape == (8, 12)
    # zero block where shift = -1
    assert h[4:8, 0:4].sum() == 0
    # each nonzero block is a permutation matrix (one 1 per row/column)
    blk = h[0:4, 4:8]
    np.testing.assert_array_equal(blk.sum(axis=0), 1)
    np.testing.assert_array_equal(blk.sum(axis=1), 1)
    # shift-1 circulant: row 0 has its 1 at column 1
    assert blk[0, 1] == 1


def test_qc_base_is_4cycle_free():
    z = 16
    base = make_qc_base(3, 8, z, seed=1)
    h = qc_expand(base, z).astype(int)
    gram = h.T @ h
    np.fill_diagonal(gram, 0)
    assert gram.max() <= 1
    np.testing.assert_array_equal(h.sum(axis=0), 3)    # regular


def test_layered_matches_flooding_clean():
    z = 16
    code = make_qc_ldpc(make_qc_base(3, 6, z, seed=2), z)
    rng = np.random.default_rng(0)
    u = rng.integers(0, 2, (4, code.k))
    cw = np.asarray(ldpc_encode(code, jnp.asarray(u)))
    llr = jnp.asarray(4.0 * (1.0 - 2.0 * cw), jnp.float32)
    b1, i1, ok1 = ldpc_decode(code, llr, iters=5)
    b2, i2, ok2 = ldpc_decode_layered(code, llr, z, iters=3)
    assert bool(jnp.all(ok1)) and bool(jnp.all(ok2))
    np.testing.assert_array_equal(np.asarray(b2), cw)
    np.testing.assert_array_equal(np.asarray(i2), u)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))


def test_layered_converges_in_half_the_iterations():
    """Serial schedule vs flooding at the SAME iteration budget near
    threshold: layered resolves at least as many blocks at half the
    iterations, and at equal iterations strictly more or equal."""
    z = 24
    code = make_qc_ldpc(make_qc_base(3, 6, z, seed=3), z)
    rate = code.k / code.n
    rng = np.random.default_rng(1)
    u = rng.integers(0, 2, (24, code.k))
    cw = np.asarray(ldpc_encode(code, jnp.asarray(u))).astype(np.float64)
    ebn0 = 10 ** (2.2 / 10)
    sigma = np.sqrt(1.0 / (2 * rate * ebn0))
    y = (1.0 - 2.0 * cw) + sigma * rng.standard_normal(cw.shape)
    llr = jnp.asarray(2.0 / sigma ** 2 * y, jnp.float32)

    def okc(res):
        return int(np.asarray(res[2]).sum())

    flood8 = okc(ldpc_decode(code, llr, iters=8))
    layer4 = okc(ldpc_decode_layered(code, llr, z, iters=4))
    layer8 = okc(ldpc_decode_layered(code, llr, z, iters=8))
    flood16 = okc(ldpc_decode(code, llr, iters=16))
    assert layer4 >= flood8 - 1, (layer4, flood8)      # half budget parity
    assert layer8 >= flood8, (layer8, flood8)          # equal budget wins
    assert layer8 >= flood16 - 1, (layer8, flood16)
    # and correctness of what converged at the largest budget
    bits, info, ok = ldpc_decode_layered(code, llr, z, iters=30)
    good = np.asarray(ok)
    np.testing.assert_array_equal(np.asarray(info)[good], u[good])
    assert good.sum() >= 20, good.sum()


def test_dual_diagonal_encode_zero_syndrome():
    from srcdsp_tpu.qcldpc import (make_dual_diagonal_base,
                                   qc_encode_dual_diagonal)
    z = 32
    base = make_dual_diagonal_base(4, 12, z, seed=0)
    h = qc_expand(base, z)
    rng = np.random.default_rng(1)
    u = rng.integers(0, 2, (8, 8 * z))
    cw = np.asarray(qc_encode_dual_diagonal(base, z, jnp.asarray(u)))
    assert cw.shape == (8, 12 * z)
    assert not ((h.astype(np.int64) @ cw.T) % 2).any()
    # systematic: info bits are the first K native columns
    np.testing.assert_array_equal(cw[:, :8 * z], u)


def test_dual_diagonal_roundtrip_through_layered_decoder():
    from srcdsp_tpu.qcldpc import (make_dual_diagonal_base, make_qc_ldpc,
                                   qc_encode_dual_diagonal)
    z = 16
    base = make_dual_diagonal_base(3, 9, z, seed=2)
    code = make_qc_ldpc(base, z)
    rng = np.random.default_rng(3)
    u = rng.integers(0, 2, (16, 6 * z))
    cw = np.asarray(qc_encode_dual_diagonal(base, z, jnp.asarray(u)))
    sigma = 0.5
    llr = jnp.asarray(
        2.0 / sigma ** 2 * ((1.0 - 2.0 * cw)
                            + sigma * rng.standard_normal(cw.shape)),
        jnp.float32)
    bits, _, ok = ldpc_decode_layered(code, llr, z=z, iters=8)
    ok = np.asarray(ok)
    assert ok.mean() > 0.9
    np.testing.assert_array_equal(np.asarray(bits)[ok, :6 * z], u[ok])


def test_load_qc_table_formats():
    from srcdsp_tpu.qcldpc import load_qc_table
    t = load_qc_table("# comment\n0 1 -1 2\n- 0, 3 1\n")
    np.testing.assert_array_equal(t, [[0, 1, -1, 2], [-1, 0, 3, 1]])
    with pytest.raises(ValueError):
        load_qc_table("1 2\n3\n")
