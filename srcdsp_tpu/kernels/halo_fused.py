"""Halo-FUSED mix+FIR+decimate kernel: the overlap-save neighbor exchange
rides INSIDE the compute pallas_call (SURVEY.md N2; ROADMAP "halo-fused
kernel"; SNIPPETS remote-DMA pattern).

dist.fused runs ppermute THEN the kernel — the halo lands before any
compute starts. This kernel starts the remote DMA of its own trailing
`hist` samples to the right neighbor FIRST, then computes blocks 1..G-1
(which need no halo) while the ICI transfer flies, and only then waits for
the left neighbor's tail and computes block 0 — compute/communication
overlap, the ring-attention schedule applied to overlap-save filtering.

Identical math to kernels.mixfir._kernel (u32-phase factored-phasor mix +
banded-Toeplitz matmuls; the body is intentionally a twin, see its layout
comments); identical cross-shard semantics to dist.fused.mix_fir_time_
sharded (shard 0 seeds from the carried stream tail). Validated bit-exact
against both in distributed interpret mode on the CPU mesh
(tests/dist/test_halo_fused.py) — one flag away from real silicon.

Scope: the whole shard is processed in ONE grid step (a static Python loop
over its blocks) so the send/compute/wait order is explicit; outputs live
in VMEM for the duration. Sized for validation and moderate shards; the
production single-chip path remains kernels.mixfir.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from srcdsp_tpu.dist.mesh import TIME_AXIS
from srcdsp_tpu.kernels.mixfir import LANE, MixFirKernel, _round_up, banded_taps
from srcdsp_tpu.ops.nco import TWO_PI, _INV_SCALE
from srcdsp_tpu.types import F32


def _kernel(word0_ref, dword_ref, tail_ref, x_hbm, hsub_ref, yr_ref, yi_ref,
            slab, comm, send_sem, recv_sem, sem, *, b_rows: int,
            out_tile: int, decim: int, hist: int, span: int,
            block_cols: int, nblocks: int, precision, axis_name: str):
    my = lax.axis_index(axis_name)
    n_sh = lax.axis_size(axis_name)
    right = lax.rem(my + 1, n_sh)
    s_local = x_hbm.shape[-1]
    stride = out_tile * decim
    block = b_rows * stride

    # 1. push this shard's trailing hist to the right neighbor (closed
    # ring keeps semaphores balanced; shard 0 overwrites its received
    # buffer with the carried stream tail below)
    rc = pltpu.make_async_remote_copy(
        src_ref=x_hbm.at[:, pl.ds(s_local - hist, hist)],
        dst_ref=comm,
        send_sem=send_sem,
        recv_sem=recv_sem,
        device_id=right,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    rc.start()

    def compute(j: int):
        # mixfir._kernel body on slab; g0 = j*block indexes the LOGICAL
        # padded stream [tail | x] exactly like the single-chip kernel
        g0 = j * block
        xr = slab[0:1, :]
        xi = slab[1:2, :]
        xwr = jnp.concatenate(
            [xr[:, b * stride: b * stride + span] for b in range(b_rows)],
            axis=0)
        xwi = jnp.concatenate(
            [xi[:, b * stride: b * stride + span] for b in range(b_rows)],
            axis=0)
        colw = word0_ref[0, 0] + (jnp.int32(g0) +
                                  jax.lax.broadcasted_iota(
                                      jnp.int32, (1, span), 1)
                                  ) * dword_ref[0, 0]
        roww = (jax.lax.broadcasted_iota(jnp.int32, (b_rows, 1), 0)
                * (jnp.int32(stride) * dword_ref[0, 0]))
        cang = colw.astype(F32) * F32(TWO_PI * _INV_SCALE)
        rang = roww.astype(F32) * F32(TWO_PI * _INV_SCALE)
        ccol = jnp.cos(cang)
        scol = jnp.sin(cang)
        crow = jnp.cos(rang)
        srow = jnp.sin(rang)
        c = crow * ccol - srow * scol
        s = crow * scol + srow * ccol
        mr = xwr * c - xwi * s
        mi = xwr * s + xwi * c
        nb = out_tile // block_cols
        bspan = block_cols * decim + hist
        for jj in range(nb):
            xs = slice(jj * block_cols * decim,
                       jj * block_cols * decim + bspan)
            ys = slice(jj * block_cols, (jj + 1) * block_cols)
            hsub = hsub_ref[jj]
            yr_ref[j * b_rows:(j + 1) * b_rows, ys] = jnp.dot(
                mr[:, xs], hsub, preferred_element_type=F32,
                precision=precision)
            yi_ref[j * b_rows:(j + 1) * b_rows, ys] = jnp.dot(
                mi[:, xs], hsub, preferred_element_type=F32,
                precision=precision)

    # 2. halo-independent blocks while the ICI transfer flies
    for j in range(1, nblocks):
        cp = pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(j * block - hist, hist + block)], slab, sem)
        cp.start()
        cp.wait()
        compute(j)

    # 3. wait for the left neighbor's tail, then the halo-dependent block
    rc.wait()

    @pl.when(my == 0)
    def _():
        comm[:, :] = tail_ref[:, :]     # stream start / carried buffer tail

    slab[:, :hist] = comm[:, :]
    cp = pltpu.make_async_copy(
        x_hbm.at[:, pl.ds(0, block)], slab.at[:, pl.ds(hist, block)], sem)
    cp.start()
    cp.wait()
    compute(0)


def make_halo_fused_kernel(taps, decim: int, out_tile: int = 128,
                           b_rows: int = 8, block_cols: int = 128,
                           precision=jax.lax.Precision.HIGHEST,
                           axis_name: str = TIME_AXIS,
                           interpret: bool = False) -> MixFirKernel:
    """Build the halo-fused kernel. The returned .fn is a PER-SHARD callable
    (word0 i32[1,1], dword i32[1,1], tail f32[2, hist], x f32[2, S_local])
    -> (yr, yi) [NT, OT], and must run inside shard_map over `axis_name`.
    Use `mix_fir_halo_sharded` for the packaged outside view."""
    taps = np.asarray(taps, np.float32)
    if not interpret:
        if b_rows % 8 != 0:
            raise ValueError(f"b_rows must be a multiple of 8, got {b_rows}")
        if out_tile % LANE != 0:
            raise ValueError(f"out_tile must be a multiple of 128, got {out_tile}")
    if out_tile % block_cols != 0:
        raise ValueError(f"out_tile {out_tile} % block_cols {block_cols} != 0")
    t = taps.shape[0]
    hist = _round_up(t - 1, LANE)
    span = out_tile * decim + hist
    hsubs = jnp.asarray(banded_taps(taps, decim, out_tile, hist, block_cols))
    nb = out_tile // block_cols
    bspan = block_cols * decim + hist
    stride = out_tile * decim
    block = b_rows * stride

    def fn(word0, dword, tail, x):
        s_local = x.shape[-1]
        if s_local % block != 0:
            raise ValueError(f"S_local={s_local} not a multiple of {block}")
        nblocks = s_local // block
        nt = nblocks * b_rows
        kern = functools.partial(
            _kernel, b_rows=b_rows, out_tile=out_tile, decim=decim,
            hist=hist, span=span, block_cols=block_cols, nblocks=nblocks,
            precision=precision, axis_name=axis_name)
        return pl.pallas_call(
            kern,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # word0 [1,1]
                pl.BlockSpec(memory_space=pltpu.SMEM),   # dword [1,1]
                pl.BlockSpec(memory_space=pltpu.VMEM),   # tail [2, hist]
                pl.BlockSpec(memory_space=pl.ANY),       # x in HBM
                pl.BlockSpec((nb, bspan, block_cols),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nt, out_tile), jnp.float32),
                jax.ShapeDtypeStruct((nt, out_tile), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, hist + block), jnp.float32),   # slab
                pltpu.VMEM((2, hist), jnp.float32),           # comm ring buf
                pltpu.SemaphoreType.DMA,                      # send
                pltpu.SemaphoreType.DMA,                      # recv
                pltpu.SemaphoreType.DMA,                      # local slab DMA
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, collective_id=1),
            interpret=pltpu.InterpretParams() if interpret else False,
        )(word0, dword, tail, x, hsubs)

    return MixFirKernel(fn=fn, num_taps=t, decim=decim, out_tile=out_tile,
                        b_rows=b_rows, hist=hist)


def mix_fir_halo_sharded(kernel: MixFirKernel, word0: int, dword: int,
                         state_tail: jax.Array, x_planes: jax.Array,
                         mesh: Mesh) -> tuple[jax.Array, jax.Array]:
    """Outside view, same contract as dist.fused.mix_fir_time_sharded:
    x_planes [2, S] time-sharded raw planes (no history), state_tail
    [2, hist] replicated carried tail. Returns (new_tail, y [2, S/decim]).
    Bit-identical to the single-device kernel on [state_tail | x]."""

    def body(tail, w0_arr, x):
        p_idx = lax.axis_index(TIME_AXIS)
        s_local = x.shape[-1]
        shift = (p_idx * jnp.int32(s_local) - jnp.int32(kernel.hist)) \
            * jnp.int32(np.uint32(dword).view(np.int32))
        w0 = (w0_arr.astype(jnp.int32) + shift).reshape(1, 1)
        dw = jnp.asarray(np.uint32(dword).view(np.int32)).reshape(1, 1)
        yr, yi = kernel.fn(w0, dw, tail, x)
        k = yr.shape[0] * yr.shape[1]
        local_tail = x[:, x.shape[-1] - kernel.hist:]
        is_last = lax.axis_index(TIME_AXIS) == lax.axis_size(TIME_AXIS) - 1
        new_tail = lax.psum(
            jnp.where(is_last, local_tail, jnp.zeros_like(local_tail)),
            TIME_AXIS)
        return new_tail, jnp.stack([yr.reshape(k), yi.reshape(k)])

    w0_arr = jnp.asarray(np.uint32(word0).view(np.int32))
    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(None, TIME_AXIS)),
        out_specs=(P(), P(None, TIME_AXIS)),
        check_vma=False)
    return f(state_tail, w0_arr, x_planes)
