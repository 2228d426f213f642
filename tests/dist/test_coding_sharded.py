"""Distribution of the round-2 components on the 8-virtual-device CPU
mesh: codeword-sharded LDPC decode (channel-DP — embarrassingly parallel,
pure sharding, zero collectives) and snapshot-sharded array covariance
(time-SP — XLA inserts the psum for the contracted sharded axis)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from srcdsp_tpu.array import sample_covariance, ula_steering
from srcdsp_tpu.dist import make_mesh
from srcdsp_tpu.ldpc import ldpc_decode, ldpc_encode, make_ldpc_code, \
    make_regular_ldpc


def test_ldpc_decode_codeword_sharded():
    """8 codewords sharded one-per-device decode bit-identically to the
    unsharded batch (the coding layer's channel-DP form)."""
    mesh = make_mesh(time=8)
    code = make_ldpc_code(make_regular_ldpc(204, 3, 6, seed=0))
    rng = np.random.default_rng(0)
    u = rng.integers(0, 2, (8, code.k))
    cw = np.asarray(ldpc_encode(code, jnp.asarray(u))).astype(np.float64)
    y = 1.0 - 2.0 * cw
    y += 0.5 * rng.standard_normal(y.shape)
    llr = jnp.asarray(8.0 * y, jnp.float32)

    dec = jax.jit(lambda l: ldpc_decode(code, l, iters=25))
    bits1, info1, ok1 = dec(llr)

    llr_s = jax.device_put(llr, NamedSharding(mesh, P("time", None)))
    bits2, info2, ok2 = dec(llr_s)
    np.testing.assert_array_equal(np.asarray(bits2), np.asarray(bits1))
    np.testing.assert_array_equal(np.asarray(ok2), np.asarray(ok1))
    assert bool(jnp.all(ok1))
    np.testing.assert_array_equal(np.asarray(info2), u)


def test_covariance_snapshot_sharded():
    """[E, N] snapshots time-sharded across 8 devices: the covariance
    einsum contracts the sharded axis (XLA emits the psum); result
    matches the single-device covariance to float tolerance."""
    mesh = make_mesh(time=8)
    rng = np.random.default_rng(1)
    e, n = 8, 8192
    a = np.asarray(ula_steering(e, 0.5, jnp.asarray([0.3])))[0]
    sig = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    x = (a[:, None] * sig[None, :]
         + 0.1 * (rng.standard_normal((e, n))
                  + 1j * rng.standard_normal((e, n)))).astype(np.complex64)
    f = jax.jit(lambda z: sample_covariance(z, loading=1e-3))
    r1 = np.asarray(f(jnp.asarray(x)))
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(None, "time")))
    r2 = np.asarray(f(xs))
    np.testing.assert_allclose(r2, r1, atol=1e-4)


def test_turbo_decode_block_sharded():
    """Turbo blocks sharded one-per-device via vmap decode identically to
    the unsharded batch (second coding-layer DP check)."""
    from srcdsp_tpu.turbo import make_turbo, turbo_decode, turbo_encode

    mesh = make_mesh(time=8)
    tc = make_turbo(96, seed=0)
    rng = np.random.default_rng(2)
    u = rng.integers(0, 2, (8, 96))
    enc = [turbo_encode(tc, jnp.asarray(row)) for row in u]
    s = jnp.stack([e[0] for e in enc]).astype(jnp.float32)
    p1 = jnp.stack([e[1] for e in enc]).astype(jnp.float32)
    p2 = jnp.stack([e[2] for e in enc]).astype(jnp.float32)
    sigma = 0.6
    def ch(b):
        return jnp.asarray(2 / sigma**2 * ((1 - 2 * np.asarray(b))
               + sigma * rng.standard_normal(b.shape)), jnp.float32)
    lls, llp1, llp2 = ch(s), ch(p1), ch(p2)
    dec = jax.jit(jax.vmap(lambda a, b, c: turbo_decode(tc, a, b, c,
                                                        iters=4)))
    bits1, _ = dec(lls, llp1, llp2)
    sh = NamedSharding(mesh, P("time", None))
    bits2, _ = dec(jax.device_put(lls, sh), jax.device_put(llp1, sh),
                   jax.device_put(llp2, sh))
    np.testing.assert_array_equal(np.asarray(bits2), np.asarray(bits1))
