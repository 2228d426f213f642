"""Pallas polyphase-bank kernel (SURVEY.md C10 hot path).

The XLA wide-matmul bank (ops.channelize_planes) materializes the shifted
frame copies in HBM — (P+1) x 2 planes ~ 19x the input traffic. This kernel
builds the same [B_K, 2(P+1)M] operand in VMEM from one slab DMA, so each
wideband sample crosses HBM exactly once:

  per grid step:
    1. DMA slab x[2, (B_K + P)*M] (frames' halo rows included);
    2. shifted-copy concat in VMEM -> SS [B_K, 2(P+1)M];
    3. one MXU matmul SS @ E_comb -> [B_K, 2M] = [Yr | Yi].

E_comb is the combined complex-arithmetic matrix from
ops.channelize_planes (identical math; outputs match the XLA bank to
float32 round-off, and that bank is tested exact against
chains.channelizer and the C++ oracle).

Callers prepend hist = P*M history samples (zeros at stream start) —
the same convention as the mixfir kernels.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from srcdsp_tpu.ops.channelize_planes import make_channelizer_mats
from srcdsp_tpu.types import F32


def _bank_kernel(x_hbm, e_ref, y_ref, slab, sem, *, b_k: int, m: int,
                 p1: int, precision):
    # x_hbm: [2, rows_total, m] (row-major view of the padded planes);
    # slab: [2, b_k + P, m] scratch
    i = pl.program_id(0)
    r0 = i * b_k   # first (oldest-halo) row of this step

    cp = pltpu.make_async_copy(
        x_hbm.at[:, pl.ds(r0, b_k + p1 - 1), :], slab, sem)
    cp.start()
    cp.wait()

    # SS[k, r*M + c] = x2[k - r, c]; shift r's block = slab rows starting
    # (P - r) into the halo region — plain sublane slices, no reshapes
    cols = []
    for plane in range(2):
        for r in range(p1):
            start = p1 - 1 - r
            cols.append(slab[plane, start: start + b_k, :])
    ss = jnp.concatenate(cols, axis=1)            # [B_K, 2*(P+1)*M]
    y_ref[:, :] = jnp.dot(ss, e_ref[:, :], preferred_element_type=F32,
                          precision=precision)


def make_bank_kernel(taps, num_channels: int, b_k: int = 256,
                     precision=jax.lax.Precision.HIGHEST,
                     interpret: bool = False):
    """Build the bank kernel. Returns (fn, hist) where
    fn: x [2, hist + N] planes -> Y [N/M, 2M] = [Yr | Yi] frame-major,
    N % (b_k * M) == 0, hist = P*M.
    """
    m = num_channels
    er_np, ei_np = make_channelizer_mats(taps, m)
    p1 = er_np.shape[0]
    hist = (p1 - 1) * m
    er_s = er_np.reshape(p1 * m, m)
    ei_s = ei_np.reshape(p1 * m, m)
    e_comb = jnp.asarray(np.block([[er_s, ei_s], [-ei_s, er_s]]))

    def fn(x):
        n = x.shape[-1] - hist
        if n % (b_k * m) != 0:
            raise ValueError(f"N={n} not a multiple of {b_k * m}")
        k = n // m
        grid = k // b_k
        x3 = x.reshape(2, (hist + n) // m, m)   # free row-major view
        kern = functools.partial(
            _bank_kernel, b_k=b_k, m=m, p1=p1, precision=precision)
        return pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((2 * p1 * m, 2 * m), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((b_k, 2 * m), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((k, 2 * m), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, b_k + p1 - 1, m), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(x3, e_comb)

    return fn, hist
