"""Pallas polyphase-bank kernel (SURVEY.md C10 hot path).

The XLA wide-matmul bank (ops.channelize_planes) materializes the shifted
frame copies in HBM — (P+1) x 2 planes ~ 19x the input traffic. This kernel
builds the operand in VMEM from one slab DMA, so each wideband sample
crosses HBM once.

Layout: PHASE-MAJOR. The caller supplies x as [2, M, P + K] planes
(phase-major view of the padded stream: column j holds frame j-P, row c
phase c; the first P columns are history — zeros at stream start). Frames
are lane columns, so every slab slice is a lane-dim slice (sublane-dim
slicing of tiled HBM memrefs is what broke the row-major variant), and the
output comes out channel-major [2M, K] = [Yr; Yi] — exactly what the
per-channel demods consume, no transpose.

  per grid step:
    1. DMA slab x[:, :, k0 : k0 + B_K + P] -> [2, M, B_K + P] VMEM;
    2. stack 2(P+1) lane-shifted [M, B_K] slices -> SS^T [2(P+1)M, B_K];
    3. one MXU matmul E_comb^T @ SS^T -> [2M, B_K].

E_comb is the combined complex-arithmetic matrix from
ops.channelize_planes (identical math, tested against it, which is itself
tested exact against chains.channelizer and the C++ oracle).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from srcdsp_tpu.ops.channelize_planes import make_channelizer_mats
from srcdsp_tpu.ops.nco import TWO_PI
from srcdsp_tpu.types import F32

STATS_LANES = 128  # stats output lane padding (2 + 2*sps columns used)


def _stage_ss(slab, ss, *, b_k: int, m: int, p1: int, hist_cols: int):
    # SS^T[(plane, r, c), k] = x_phase[plane, c, k - r]. The lane-shifted
    # slices carry different lane offsets, which Mosaic refuses to
    # concatenate directly — staging each through the ss scratch normalizes
    # the layouts (the write realigns to offset 0).
    for plane in range(2):
        for r in range(p1):
            start = hist_cols - r
            row0 = (plane * p1 + r) * m
            ss[row0: row0 + m, :] = slab[plane, :, start: start + b_k]


def _bank_kernel(x_hbm, e_ref, y_ref, slab, ss, sem, *, b_k: int, m: int,
                 p1: int, hist_cols: int, precision):
    """Manual-DMA form: one blocking slab copy per grid step."""
    i = pl.program_id(0)
    k0 = i * b_k   # oldest halo column of this step

    cp = pltpu.make_async_copy(
        x_hbm.at[:, :, pl.ds(k0, b_k + hist_cols)], slab, sem)
    cp.start()
    cp.wait()

    _stage_ss(slab[:, :, :], ss, b_k=b_k, m=m, p1=p1, hist_cols=hist_cols)
    y_ref[:, :] = jnp.dot(e_ref[:, :], ss[:, :], preferred_element_type=F32,
                          precision=precision)


def _bank_kernel_pipelined(x_main, x_ov, e_ref, y_ref, ss, *, b_k: int,
                           m: int, p1: int, hist_cols: int, precision):
    """Pipelined form: the overlapping slab arrives as TWO BlockSpec
    operands (the b_k hop block, whose front IS this step's halo, + the
    next block's hist_cols prefix), so the Pallas grid pipeline
    double-buffers the HBM loads behind the previous step's matmul.
    Identical math — bit-identical (tested)."""
    slab = jnp.concatenate([x_main[:, :, :], x_ov[:, :, :]], axis=-1)
    _stage_ss(slab, ss, b_k=b_k, m=m, p1=p1, hist_cols=hist_cols)
    y_ref[:, :] = jnp.dot(e_ref[:, :], ss[:, :], preferred_element_type=F32,
                          precision=precision)


def _bank_psk_kernel(x_hbm, e_ref, perm_ref, y_ref, st_ref, slab, ss, sem,
                     *, b_k: int, m: int, p1: int, hist_cols: int,
                     precision, sps: int, order: int, class_major: bool):
    """Bank kernel + fused PSK epilogue stats (the config-5 analog of the
    fused FSK timing sums): per grid step, alongside the bank output,
    accumulate the O&M timing-tone partial sums over |y|^2 and the per-
    offset-class Viterbi&Viterbi power sums sum_{k%sps==o} y^order — so the
    XLA tail only reduces [G, M, lanes] stats, picks, and slices instead of
    making several full passes over the [2M, K] bank output.

    st layout per step: [M, STATS_LANES]: col 0 = sum(|y|^2 cos), col 1 =
    sum(|y|^2 * -sin) (O&M tone at k mod sps), cols 2..2+sps = Re sum y^M
    per offset class, cols 2+sps..2+2sps = Im, rest zeros. V&V sums are
    UNnormalized (amplitude normalization scales out of the phase angle).
    """
    i = pl.program_id(0)
    k0 = i * b_k

    cp = pltpu.make_async_copy(
        x_hbm.at[:, :, pl.ds(k0, b_k + hist_cols)], slab, sem)
    cp.start()
    cp.wait()

    _stage_ss(slab[:, :, :], ss, b_k=b_k, m=m, p1=p1, hist_cols=hist_cols)
    yv = jnp.dot(e_ref[:, :], ss[:, :], preferred_element_type=F32,
                 precision=precision)
    _psk_epilogue(yv, perm_ref, y_ref, st_ref, i, b_k=b_k, m=m, sps=sps,
                  order=order, class_major=class_major)


def _bank_psk_kernel_pipelined(x_main, x_ov, e_ref, perm_ref, y_ref,
                               st_ref, ss, *, b_k: int, m: int, p1: int,
                               hist_cols: int, precision, sps: int,
                               order: int, class_major: bool):
    """Pipelined dual-BlockSpec form of _bank_psk_kernel (see
    _bank_kernel_pipelined). Identical math — bit-identical (tested)."""
    i = pl.program_id(0)
    slab = jnp.concatenate([x_main[:, :, :], x_ov[:, :, :]], axis=-1)
    _stage_ss(slab, ss, b_k=b_k, m=m, p1=p1, hist_cols=hist_cols)
    yv = jnp.dot(e_ref[:, :], ss[:, :], preferred_element_type=F32,
                 precision=precision)
    _psk_epilogue(yv, perm_ref, y_ref, st_ref, i, b_k=b_k, m=m, sps=sps,
                  order=order, class_major=class_major)


def _psk_epilogue(yv, perm_ref, y_ref, st_ref, i, *, b_k: int, m: int,
                  sps: int, order: int, class_major: bool):
    if not class_major:
        y_ref[:, :] = yv

    yr = yv[:m, :]
    yi = yv[m:, :]
    power = yr * yr + yi * yi
    col = jax.lax.broadcasted_iota(jnp.int32, (m, b_k), 1)
    koff = jnp.mod(jnp.int32(i * b_k) + col, jnp.int32(sps))
    ang = koff.astype(F32) * F32(TWO_PI / sps)
    rs_c = jnp.sum(power * jnp.cos(ang), axis=1, keepdims=True)
    rs_s = jnp.sum(power * (-jnp.sin(ang)), axis=1, keepdims=True)

    # y^order by repeated squaring (order is a power of two, checked at build)
    pr, pi = yr, yi
    o = order
    while o > 1:
        pr, pi = pr * pr - pi * pi, 2.0 * pr * pi
        o >>= 1

    st_ref[0, :, :] = jnp.zeros((m, STATS_LANES), F32)
    st_ref[0, :, 0:1] = rs_c
    st_ref[0, :, 1:2] = rs_s
    for off in range(sps):
        mask = (koff == off).astype(F32)
        st_ref[0, :, 2 + off: 3 + off] = jnp.sum(
            pr * mask, axis=1, keepdims=True)
        st_ref[0, :, 2 + sps + off: 3 + sps + off] = jnp.sum(
            pi * mask, axis=1, keepdims=True)

    if class_major:
        # permute this block's lanes to offset-class-major order (1-pass
        # matmul; sign-safe) so the demod tail's pick avoids the minor-sps
        # relayout — same trick as kernels.fsk_fused class_major
        y_ref[:, :] = jnp.dot(yv, perm_ref[:, :], preferred_element_type=F32,
                              precision=jax.lax.Precision.DEFAULT)


def phase_major(x: jax.Array, m: int, hist: int) -> jax.Array:
    """[2, hist + N] planes -> [2, M, (hist + N)/M] phase-major view."""
    total = x.shape[-1]
    return x.reshape(2, total // m, m).swapaxes(-1, -2)


def make_bank_kernel(taps, num_channels: int, b_k: int = 256,
                     precision=jax.lax.Precision.HIGHEST,
                     pipelined: bool | None = None,
                     interpret: bool = False):
    """Build the bank kernel. Returns (fn, hist_cols):

    fn: x [2, M, hist_cols + K] phase-major planes -> Y [2M, K] = [Yr; Yi]
    channel-major; K % b_k == 0. hist_cols is P-1 rounded UP to a full lane
    tile (multiple of 128) — callers must prepend exactly `hist_cols`
    history COLUMNS (hist_cols*M samples; zeros at stream start), NOT P.
    Use `phase_major()` to build the input from flat padded planes.

    `pipelined`: stage the input through grid BlockSpecs (the b_k hop
    block + the next block's hist_cols prefix) so the pipeline
    double-buffers HBM loads behind the matmuls, instead of the manual
    blocking slab DMA. Requires hist_cols | b_k; None = auto.
    Outputs are bit-identical either way.
    """
    m = num_channels
    er_np, ei_np = make_channelizer_mats(taps, m)
    p1 = er_np.shape[0]
    # lane-dim DMA slices must be 128-aligned on tiled HBM memrefs: round
    # the history columns up to a full lane tile (extra columns are zeros)
    hist_cols = ((p1 - 1 + 127) // 128) * 128
    er_s = er_np.reshape(p1 * m, m)
    ei_s = ei_np.reshape(p1 * m, m)
    e_comb_t = jnp.asarray(np.block([[er_s, ei_s], [-ei_s, er_s]]).T.copy())
    pipe_ok = b_k % hist_cols == 0
    use_pipe = pipe_ok if pipelined is None else pipelined
    if use_pipe and not pipe_ok:
        raise ValueError(
            f"pipelined form needs hist_cols ({hist_cols}) | b_k ({b_k})")

    def fn(x):
        k = x.shape[-1] - hist_cols
        if k % b_k != 0:
            raise ValueError(f"K={k} not a multiple of b_k={b_k}")
        grid = k // b_k
        common = dict(b_k=b_k, m=m, p1=p1, hist_cols=hist_cols,
                      precision=precision)
        if use_pipe:
            kern = functools.partial(_bank_kernel_pipelined, **common)
            x_specs = [
                pl.BlockSpec((2, m, b_k), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, m, hist_cols),
                             lambda i: (0, 0, (i + 1) * b_k // hist_cols),
                             memory_space=pltpu.VMEM),
            ]
            x_args = (x, x)
            slab_scratch = []
        else:
            kern = functools.partial(_bank_kernel, **common)
            x_specs = [pl.BlockSpec(memory_space=pl.ANY)]
            x_args = (x,)
            slab_scratch = [
                pltpu.VMEM((2, m, b_k + hist_cols), jnp.float32),
            ]
        sem_scratch = [] if use_pipe else [pltpu.SemaphoreType.DMA]
        return pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=x_specs + [
                pl.BlockSpec((2 * m, 2 * p1 * m), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((2 * m, b_k), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2 * m, k), jnp.float32),
            scratch_shapes=slab_scratch + [
                pltpu.VMEM((2 * p1 * m, b_k), jnp.float32),
            ] + sem_scratch,
            interpret=interpret,
        )(*x_args, e_comb_t)

    return fn, hist_cols


def bank_os2_pallas(fn, hist_cols: int, x_flat: jax.Array, num_channels: int
                    ) -> jax.Array:
    """2x-oversampled analysis from the critically-sampled Pallas bank.

    An os2 bank (frames advance by M/2) is exactly TWO critically-sampled
    banks: the even frames are the standard bank; the odd frames are the
    same bank run on the stream advanced by M/2 samples, with odd channels
    negated (the (-1)^{ch*k} twiddle: k odd). So the Pallas fast path
    composes two calls of `fn` (from make_bank_kernel) and interleaves —
    no new kernel.

    x_flat: [2, (hist_cols + K) * M] flat padded planes (hist_cols*M
    history samples, zeros at stream start), K*M payload with K % b_k == 0.
    Returns Y [2M, 2K] channel-major at the 2x rate (frame j at stream
    sample j*M/2), matching chains.channelizer.channelize_os2_apply.

    Lookahead caveat: the LAST odd frame anchors M/2 samples past the
    payload and is computed against zero padding here; streaming callers
    should overlap consecutive chunks by M samples (drop the final even/odd
    pair and recompute it with the next chunk) when that frame matters.
    """
    m = num_channels
    hop = m // 2
    total = x_flat.shape[-1]
    k = total // m - hist_cols
    y_even = fn(phase_major(x_flat, m, hist_cols))            # [2M, K]
    # odd frames: stream shifted LEFT by hop (frame j' of the shifted
    # stream anchors at sample j'*M + hop); drop the first hop samples of
    # history and pad the tail so the column count stays K + hist_cols
    x_shift = jnp.concatenate(
        [x_flat[:, hop:], jnp.zeros((2, hop), x_flat.dtype)], axis=-1)
    y_odd = fn(phase_major(x_shift, m, hist_cols))            # [2M, K]
    sign = jnp.asarray(np.where(np.arange(m) % 2 == 1, -1.0, 1.0),
                       jnp.float32)[:, None]
    sign2 = jnp.concatenate([sign, sign], axis=0)             # [2M, 1]
    y = jnp.stack([y_even, y_odd * sign2], axis=-1)           # [2M, K, 2]
    return y.reshape(2 * m, 2 * k)


def make_bank_psk_kernel(taps, num_channels: int, sps: int, order: int = 4,
                         b_k: int = 256,
                         precision=jax.lax.Precision.HIGHEST,
                         class_major: bool = False,
                         pipelined: bool | None = None,
                         interpret: bool = False):
    """Bank kernel + fused PSK epilogue stats. Returns (fn, hist_cols):

    fn: x [2, M, hist_cols + K] phase-major -> (Y [2M, K], stats
    [K/b_k, M, STATS_LANES]). Feed the pair to
    chains.psk_planes.psk_demod_bank_stats for the 3-op demod tail.
    b_k must be a multiple of sps so every grid step covers whole
    offset-class periods; order must be a power of two (V&V by repeated
    squaring on the VPU). class_major=True permutes each b_k block's
    lanes to offset-class-major order in-kernel (pass the same flag plus
    b_k to psk_demod_bank_stats) — the tail pick then reduces over a
    second-minor sps axis with 128-lane minors instead of paying the
    minor-sps relayout.
    """
    m = num_channels
    if order & (order - 1) or order < 2:
        raise ValueError(f"order must be a power of two >= 2, got {order}")
    if b_k % sps != 0:
        raise ValueError(f"b_k {b_k} % sps {sps} != 0")
    er_np, ei_np = make_channelizer_mats(taps, m)
    p1 = er_np.shape[0]
    hist_cols = ((p1 - 1 + 127) // 128) * 128
    er_s = er_np.reshape(p1 * m, m)
    ei_s = ei_np.reshape(p1 * m, m)
    e_comb_t = jnp.asarray(np.block([[er_s, ei_s], [-ei_s, er_s]]).T.copy())
    pm = np.zeros((b_k, b_k), np.float32)
    for k_ in range(b_k):
        pm[k_, (k_ % sps) * (b_k // sps) + k_ // sps] = 1.0
    perm = jnp.asarray(pm)
    pipe_ok = b_k % hist_cols == 0
    use_pipe = pipe_ok if pipelined is None else pipelined
    if use_pipe and not pipe_ok:
        raise ValueError(
            f"pipelined form needs hist_cols ({hist_cols}) | b_k ({b_k})")

    def fn(x):
        k = x.shape[-1] - hist_cols
        if k % b_k != 0:
            raise ValueError(f"K={k} not a multiple of b_k={b_k}")
        grid = k // b_k
        common = dict(b_k=b_k, m=m, p1=p1, hist_cols=hist_cols,
                      precision=precision, sps=sps, order=order,
                      class_major=class_major)
        if use_pipe:
            kern = functools.partial(_bank_psk_kernel_pipelined, **common)
            x_specs = [
                pl.BlockSpec((2, m, b_k), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, m, hist_cols),
                             lambda i: (0, 0, (i + 1) * b_k // hist_cols),
                             memory_space=pltpu.VMEM),
            ]
            x_args = (x, x)
            scratch = [pltpu.VMEM((2 * p1 * m, b_k), jnp.float32)]
        else:
            kern = functools.partial(_bank_psk_kernel, **common)
            x_specs = [pl.BlockSpec(memory_space=pl.ANY)]
            x_args = (x,)
            scratch = [
                pltpu.VMEM((2, m, b_k + hist_cols), jnp.float32),
                pltpu.VMEM((2 * p1 * m, b_k), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ]
        return pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=x_specs + [
                pl.BlockSpec((2 * m, 2 * p1 * m), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_k, b_k), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((2 * m, b_k), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m, STATS_LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((2 * m, k), jnp.float32),
                jax.ShapeDtypeStruct((grid, m, STATS_LANES), jnp.float32),
            ],
            scratch_shapes=scratch,
            interpret=interpret,
        )(*x_args, e_comb_t, perm)

    return fn, hist_cols
