"""Pallas remote-DMA halo exchange (SURVEY.md N2; SNIPPETS §1/§3 pattern).

The XLA path (`dist.halo`) lets `shard_map` emit a `ppermute` for the
overlap-save halo. This module is the hand-scheduled alternative: a Pallas
kernel that pushes the shard's trailing `halo` samples to its right
neighbor over ICI with `pltpu.make_async_remote_copy`. Two reasons it
exists:

1. on a real slice the DMA can be started before the producing FIR block
   finishes its tail and overlapped with compute (the ring-attention trick);
2. it is the building block for the halo-FUSED mix+FIR kernel, where the
   DMA rides inside the same `pallas_call` as the matmul.

Semantics match `dist.halo.halo_from_left` exactly: every shard receives
its LEFT neighbor's tail; shard 0 receives zeros (stream start). The
transfer itself is a closed ring (P-1 also sends to 0, keeping the
send/recv semaphores balanced on every device); shard 0 then overwrites
its received buffer with zeros.

Runs on real TPU slices compiled, and on the fake CPU mesh via
`pltpu.InterpretParams` — which is how tests/dist exercises it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from srcdsp_tpu.dist.mesh import TIME_AXIS


def _halo_kernel(x_ref, out_ref, send_sem, recv_sem, zero_sem, zeros_vmem,
                 *, halo: int, axis_name: str):
    my = lax.axis_index(axis_name)
    n = lax.axis_size(axis_name)
    right = lax.rem(my + 1, n)
    length = x_ref.shape[-1]
    rc = pltpu.make_async_remote_copy(
        src_ref=x_ref.at[:, pl.ds(length - halo, halo)],
        dst_ref=out_ref,
        send_sem=send_sem,
        recv_sem=recv_sem,
        device_id=right,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    rc.start()
    rc.wait()

    @pl.when(my == 0)
    def _():
        # stream start: overwrite the ring-received tail with zeros (the
        # out buffer lives in HBM/ANY, so the write is a local DMA)
        zeros_vmem[:, :] = jnp.zeros_like(zeros_vmem)
        cp = pltpu.make_async_copy(zeros_vmem, out_ref, zero_sem)
        cp.start()
        cp.wait()


def halo_from_left_pallas(x: jax.Array, halo: int, mesh: Mesh,
                          axis_name: str = TIME_AXIS,
                          interpret: bool = False) -> jax.Array:
    """x: [R, S] f32, time-sharded on the last axis -> [R, halo] per shard:
    the left neighbor's trailing `halo` samples (zeros on shard 0).

    Complex streams pass their planes as rows (R = 2). The result has the
    same sharding layout as x (each shard holds its own halo block).
    """
    kern = functools.partial(_halo_kernel, halo=halo, axis_name=axis_name)

    def per_shard(xs):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((xs.shape[0], halo), xs.dtype),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA] * 3
            + [pltpu.VMEM((xs.shape[0], halo), xs.dtype)],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, collective_id=0),
            interpret=pltpu.InterpretParams() if interpret else False,
        )(xs)

    f = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=P(None, axis_name), out_specs=P(None, axis_name),
        check_vma=False)
    return f(x)
