"""Pallas LDPC decoder kernels vs their jnp reference tiers (bit-exact)
and vs the dense ldpc.py decoders (decision agreement + BER sanity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srcdsp_tpu.kernels.ldpc_pallas import (
    ldpc_decode_edges_ref, ldpc_decode_pallas, make_ldpc_kernel,
    make_qc_kernel, plan_edges, plan_qc, qc_decode_layered_pallas,
    qc_decode_layered_ref)
from srcdsp_tpu.ldpc import (ldpc_decode, ldpc_encode, make_ldpc_code,
                             make_regular_ldpc)
from srcdsp_tpu.qcldpc import ldpc_decode_layered, make_qc_base, qc_expand

N = 120          # small regular code keeps interpret-mode tests fast
ITERS = 6


@pytest.fixture(scope="module")
def fixture():
    h = make_regular_ldpc(N, 3, 6, seed=1)
    code = make_ldpc_code(h)
    plan = plan_edges(h)
    rng = np.random.default_rng(7)
    u = rng.integers(0, 2, (24, code.k))
    cw = np.asarray(ldpc_encode(code, jnp.asarray(u)))
    sigma = 0.5
    y = (1.0 - 2.0 * cw) + sigma * rng.standard_normal(cw.shape)
    llr = jnp.asarray(2.0 / sigma ** 2 * y, jnp.float32)
    return h, code, plan, u, cw, llr


def test_plan_shapes(fixture):
    h, code, plan, *_ = fixture
    assert plan.dc == 6 and plan.dv == 3
    assert plan.perm.shape == (3 * plan.n_pad, 6 * plan.m_pad)
    # exactly one 1 per real edge, both directions
    assert plan.perm.sum() == h.sum()
    assert (plan.perm.sum(axis=0) <= 1).all()
    assert (plan.perm.sum(axis=1) <= 1).all()


def test_kernel_matches_reference_bitwise(fixture):
    _, code, plan, _, _, llr = fixture
    lf = llr.T                                     # [N, B]
    lf = jnp.pad(lf, ((0, 0), (0, 128 - lf.shape[1])))
    ref = ldpc_decode_edges_ref(plan, lf, iters=ITERS)
    run = make_ldpc_kernel(plan, iters=ITERS, interpret=True)
    out = run(lf)
    assert np.array_equal(np.asarray(out), np.asarray(ref)), (
        "Pallas edge decode must be bit-identical to the jnp reference")


def test_pallas_decodes_correctly(fixture):
    _, code, plan, u, cw, llr = fixture
    bits, info, ok = ldpc_decode_pallas(code, plan, llr, iters=10,
                                        interpret=True)
    assert bool(np.asarray(jnp.all(ok)))
    np.testing.assert_array_equal(np.asarray(bits), cw)
    np.testing.assert_array_equal(np.asarray(info), u)


def test_quantized_tracks_dense_decisions(fixture):
    # The bf16-quantized edge decode is a different (coarser) arithmetic
    # than the dense f32 path, but on a comfortably-converging fixture
    # both must land on the transmitted codeword.
    _, code, plan, u, cw, llr = fixture
    b1, i1, ok1 = ldpc_decode(code, llr, iters=10)
    b2, i2, ok2 = ldpc_decode_pallas(code, plan, llr, iters=10,
                                     interpret=True)
    both = np.asarray(ok1) & np.asarray(ok2)
    assert both.mean() > 0.9
    np.testing.assert_array_equal(np.asarray(b1)[both], np.asarray(b2)[both])


def test_irregular_h_supported():
    # knock out a few edges -> irregular row/col degrees; the masked plan
    # must still match its reference bitwise and decode a clean word.
    h = make_regular_ldpc(N, 3, 6, seed=3)
    h[0, np.flatnonzero(h[0])[0]] = 0
    h[5, np.flatnonzero(h[5])[0]] = 0
    code = make_ldpc_code(h)
    plan = plan_edges(h)
    rng = np.random.default_rng(11)
    u = rng.integers(0, 2, (8, code.k))
    cw = np.asarray(ldpc_encode(code, jnp.asarray(u)))
    llr = jnp.asarray(8.0 * (1.0 - 2.0 * cw)
                      + 0.3 * rng.standard_normal(cw.shape), jnp.float32)
    lf = jnp.pad(llr.T, ((0, 0), (0, 128 - llr.shape[0])))
    ref = ldpc_decode_edges_ref(plan, lf, iters=ITERS)
    out = make_ldpc_kernel(plan, iters=ITERS, interpret=True)(lf)
    assert np.array_equal(np.asarray(out), np.asarray(ref))
    bits, info, ok = ldpc_decode_pallas(code, plan, llr, iters=8,
                                        interpret=True)
    assert bool(np.asarray(jnp.all(ok)))
    np.testing.assert_array_equal(np.asarray(info), u)


# ---------------------------------------------------------------------------
# QC layered kernel
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def qc_fixture():
    z = 16
    base = make_qc_base(3, 8, z, seed=2)
    # sparsify: drop two blocks to exercise -1 (zero-block) handling
    base[0, 3] = -1
    base[2, 6] = -1
    from srcdsp_tpu.qcldpc import make_qc_ldpc
    code = make_qc_ldpc(base, z)
    plan = plan_qc(base, z)
    rng = np.random.default_rng(5)
    u = rng.integers(0, 2, (16, code.k))
    cw = np.asarray(ldpc_encode(code, jnp.asarray(u)))
    sigma = 0.6
    y = (1.0 - 2.0 * cw) + sigma * rng.standard_normal(cw.shape)
    llr = jnp.asarray(2.0 / sigma ** 2 * y, jnp.float32)
    return base, z, code, plan, u, cw, llr


def test_qc_kernel_matches_reference_bitwise(qc_fixture):
    # jit both tiers: XLA contracts mul+add into FMA under jit, so the
    # eager reference rounds differently — the serving contract is
    # jit-to-jit (the kernel module docstring documents this).
    base, z, code, plan, u, cw, llr = qc_fixture
    lf = jnp.pad(llr.T, ((0, 0), (0, 128 - llr.shape[0])))
    ref = jax.jit(lambda l: qc_decode_layered_ref(plan, l, iters=4))(lf)
    out = jax.jit(make_qc_kernel(plan, iters=4, interpret=True))(lf)
    assert np.array_equal(np.asarray(out), np.asarray(ref)), (
        "QC layered kernel must be bit-identical to the jnp reference")


def test_qc_pallas_decodes_correctly(qc_fixture):
    base, z, code, plan, u, cw, llr = qc_fixture
    bits, info, ok = qc_decode_layered_pallas(code, plan, llr, iters=4,
                                              interpret=True)
    ok = np.asarray(ok)
    assert ok.mean() > 0.9
    np.testing.assert_array_equal(np.asarray(bits)[ok], cw[ok])


def test_qc_layered_agrees_with_dense_layered(qc_fixture):
    # same serial schedule as qcldpc.ldpc_decode_layered -> decisions must
    # agree on converged words (arithmetic differs only in reduction form)
    base, z, code, plan, u, cw, llr = qc_fixture
    b1, _, ok1 = ldpc_decode_layered(code, llr, z=z, iters=4)
    b2, _, ok2 = qc_decode_layered_pallas(code, plan, llr, iters=4,
                                          interpret=True)
    both = np.asarray(ok1) & np.asarray(ok2)
    assert both.mean() > 0.9
    np.testing.assert_array_equal(np.asarray(b1)[both], np.asarray(b2)[both])


def test_qc_plan_validation():
    with pytest.raises(ValueError):
        plan_qc(np.zeros((2, 4), np.int64), z=12)   # z % 8 != 0
    bad = -np.ones((2, 4), np.int64)
    bad[0, 0] = 1
    with pytest.raises(ValueError):
        plan_qc(bad, z=16)                          # layer degree < 2
