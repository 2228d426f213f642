"""Checkpoint/resume: resumed streaming == unbroken streaming, bit-exact."""

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu import checkpoint
from srcdsp_tpu.chains.fsk import fsk_apply, fsk_init, make_fsk_params
from srcdsp_tpu.io.capture import CaptureMeta, read_capture_blocks, write_capture
from srcdsp_tpu.testing.signals import fsk_baseband, random_bits, tone


def test_resume_bit_exact(tmp_path):
    decim, sps, dev, center = 4, 8, 0.05, 0.11
    params = make_fsk_params(center, 64, 0.03, decim, sps, dev)
    bits = random_bits(jax.random.PRNGKey(0), (512,))
    bb = fsk_baseband(bits, decim * sps, dev / decim)
    x = np.asarray(bb * tone(bb.shape[-1], center))

    cap = str(tmp_path / "cap.cf32")
    write_capture(cap, x, CaptureMeta(fmt="cf32"))
    block = decim * sps * 64
    ckpt = str(tmp_path / "ckpt")

    # run A: all blocks, checkpoint after block 3
    st = fsk_init(params)
    outs_a = []
    for i, xb in enumerate(read_capture_blocks(cap, block)):
        st, (b, _) = fsk_apply(params, st, jnp.asarray(xb))
        outs_a.append(np.asarray(b))
        if i == 3:
            checkpoint.save(ckpt, st, block_index=i + 1)
    ref = np.concatenate(outs_a[4:])

    # run B: fresh process state, restore, resume from block 4
    st0 = fsk_init(params)
    st_r, start = checkpoint.restore(ckpt, st0)
    assert start == 4
    outs_b = []
    for xb in read_capture_blocks(cap, block, start_block=start):
        st_r, (b, _) = fsk_apply(params, st_r, jnp.asarray(xb))
        outs_b.append(np.asarray(b))
    got = np.concatenate(outs_b)
    np.testing.assert_array_equal(ref, got)


def test_block_index_atomic_with_state(tmp_path):
    """block_index rides inside the .npz: a stale .json (crash between the
    two writes) cannot desync position from state."""
    import json

    params = make_fsk_params(0.1, 32, 0.05, 2, 4, 0.05)
    st = fsk_init(params)
    p = str(tmp_path / "c")
    checkpoint.save(p, st, block_index=9)
    with open(p + ".json") as f:
        meta = json.load(f)
    meta["block_index"] = 4  # simulate stale sidecar
    with open(p + ".json", "w") as f:
        json.dump(meta, f)
    _, blk = checkpoint.restore(p, fsk_init(params))
    assert blk == 9


def test_delete(tmp_path):
    params = make_fsk_params(0.1, 32, 0.05, 2, 4, 0.05)
    p = str(tmp_path / "c")
    checkpoint.save(p, fsk_init(params), 1)
    assert checkpoint.exists(p)
    checkpoint.delete(p)
    assert not checkpoint.exists(p)
    checkpoint.delete(p)  # idempotent


def test_restore_shape_mismatch_raises(tmp_path):
    params = make_fsk_params(0.1, 32, 0.05, 2, 4, 0.05)
    st = fsk_init(params)
    ckpt = str(tmp_path / "c")
    checkpoint.save(ckpt, st, 0)
    other = fsk_init(make_fsk_params(0.1, 64, 0.05, 2, 4, 0.05))
    import pytest
    with pytest.raises(ValueError):
        checkpoint.restore(ckpt, other)


def test_orbax_backend_roundtrip(tmp_path):
    params = make_fsk_params(0.1, 32, 0.05, 2, 4, 0.05)
    st = fsk_init(params)
    # mutate state so restore is distinguishable from init
    st = st._replace(disc_last=st.disc_last + (0.5 + 0.25j))
    p = str(tmp_path / "ck")
    checkpoint.save_orbax(p, st, block_index=7)
    st2, blk = checkpoint.restore_orbax(p, fsk_init(params))
    assert blk == 7
    a = jax.tree_util.tree_leaves(st)
    b = jax.tree_util.tree_leaves(st2)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
