"""Multi-stage decimation planner (beyond parity).

The reference family decimates with ONE general FIR (SURVEY C3) — for
large factors that is the expensive way: a decimate-by-D filter protecting
a narrow passband needs its tap count set by the FINAL transition width
but runs at the INPUT rate. The textbook fix is a cascade: cheap wide-
transition half-band stages (ops.halfband — half the MACs of a general
FIR) burn down powers of two at ever-halving rates, and one general
polyphase stage handles the residual factor with the tight spec at the
lowest possible rate. This module automates the design:

    plan = plan_decimation(decim=48, passband=0.008, atten_db=70)
    state = decim_plan_init(plan)
    state, y = decim_plan_apply(plan, state, x)     # streaming, carried

The plan's contract is ALIAS PROTECTION OF THE PASSBAND [0, passband]
(the standard multistage criterion): every frequency that folds onto the
passband after the full decimation is attenuated by >= atten_db. Each
half-band stage i (input rate fs_i, cutoff fixed at fs_i/4) therefore
only needs its stopband to start at fs_i/2 - passband — a transition that
is enormous at the early stages, which is exactly why they are cheap.

Design is host-side numpy (like ops/design.py); the runtime composes the
existing streaming machinery (ops.halfband cascade + ops.fir polyphase
decimator), so everything jits/vmaps/shards as usual.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.ops.design import kaiser_num_taps
from srcdsp_tpu.ops.fir import FirState, fir_apply, fir_init
from srcdsp_tpu.ops.halfband import (
    HalfbandState, cascade_apply, cascade_init, design_halfband,
)
from srcdsp_tpu.ops.window import lowpass
from srcdsp_tpu.types import CF32

__all__ = ["DecimPlan", "plan_decimation", "decim_plan_init",
           "decim_plan_apply", "plan_response", "single_stage_taps"]


class DecimPlan(NamedTuple):
    """halfband_taps: per-stage designs (earliest/highest-rate first).
    final_taps / final_decim: residual general polyphase stage (final_decim
    may be 1: a pure shaping stage, or the whole plan may have no final
    stage when the factor is a power of two). macs_per_input: cost model,
    real MACs per INPUT sample. decim: total factor."""

    halfband_taps: tuple
    final_taps: np.ndarray | None
    final_decim: int
    decim: int
    passband: float
    atten_db: float
    macs_per_input: float


class DecimPlanState(NamedTuple):
    hb: tuple          # tuple[HalfbandState, ...]
    fir: FirState | None


def _round_4k3(n: int) -> int:
    """Smallest half-band-legal tap count (4k+3) >= n."""
    return n + (3 - n) % 4


def single_stage_taps(decim: int, passband: float, atten_db: float) -> int:
    """Tap count of the single-stage equivalent (the reference's C3 shape):
    transition from `passband` to the first alias edge 1/decim - passband,
    run at the full input rate."""
    transition = max(1.0 / decim - 2.0 * passband, 1e-6)
    return kaiser_num_taps(atten_db, transition)


def plan_decimation(decim: int, passband: float, atten_db: float = 70.0
                    ) -> DecimPlan:
    """Design a multistage decimator: half-bands for the 2^k factor, one
    general polyphase stage for the odd residual.

    decim: total integer factor. passband: protected band edge in
    cycles/sample AT THE INPUT RATE (must be < 0.5/decim). atten_db:
    minimum attenuation of everything aliasing onto [0, passband].
    """
    if decim < 2:
        raise ValueError("decim must be >= 2")
    if not 0.0 < passband < 0.5 / decim:
        raise ValueError(f"passband {passband} must lie in (0, {0.5 / decim}"
                         f") for decim {decim}")
    k = 0
    residual = decim
    while residual % 2 == 0:
        residual //= 2
        k += 1
    # Kaiser's tap-count formula is an ESTIMATE that can undershoot by a
    # few dB near the band edges; design every stage with a 5 dB margin so
    # the delivered cascade meets atten_db, not just approaches it.
    atten = atten_db + 5.0

    hb = []
    macs = 0.0
    rate = 1.0                       # current rate in input-rate units
    for _ in range(k):
        fp = passband / rate         # passband in current-rate units
        # stopband must start where the next octave folds onto the passband
        transition = 0.5 - 2.0 * fp
        n = _round_4k3(kaiser_num_taps(atten, transition))
        hb.append(design_halfband(n, atten_db=atten))
        # polyphase halfband: (n+1)/2 + 1 nonzero taps, output rate rate/2
        macs += (rate / 2.0) * ((n + 1) // 2 + 1)
        rate /= 2.0

    if residual > 1:
        fp = passband / rate
        stop = 1.0 / residual - fp   # first alias edge at the final rate
        transition = max(stop - fp, 1e-6)
        n = kaiser_num_taps(atten, transition)
        cutoff = 0.5 * (fp + stop)
        final = lowpass(n, cutoff, window="kaiser", atten_db=atten)
        macs += (rate / residual) * n
        final = np.asarray(final, np.float32)
    else:
        final = None
    return DecimPlan(halfband_taps=tuple(hb), final_taps=final,
                     final_decim=residual, decim=decim, passband=passband,
                     atten_db=atten_db, macs_per_input=float(macs))


def decim_plan_init(plan: DecimPlan, channel_shape: tuple = (),
                    dtype=CF32) -> DecimPlanState:
    return DecimPlanState(
        hb=cascade_init(plan.halfband_taps, channel_shape, dtype),
        fir=(fir_init(len(plan.final_taps), channel_shape, dtype=dtype)
             if plan.final_taps is not None else None),
    )


def decim_plan_apply(plan: DecimPlan, state: DecimPlanState, x: jax.Array
                     ) -> tuple[DecimPlanState, jax.Array]:
    """Run one block through the cascade. x: [..., N], N % decim == 0."""
    hb_s, y = cascade_apply(plan.halfband_taps, state.hb, x)
    fir_s = state.fir
    if plan.final_taps is not None:
        fir_s, y = fir_apply(jnp.asarray(plan.final_taps), fir_s, y,
                             decim=plan.final_decim)
    return DecimPlanState(hb=hb_s, fir=fir_s), y


def plan_response(plan: DecimPlan, nfreq: int = 4096) -> tuple:
    """(freqs at the INPUT rate on [0, 0.5], |H| of the full cascade).

    Stage i's response is evaluated at f/rate_i (its own normalized
    frequency, periodic in its rate): the exact composite response of the
    multirate chain before any decimation aliasing.
    """
    f = np.linspace(0.0, 0.5, nfreq)
    h_tot = np.ones(nfreq, np.complex128)
    rate = 1.0
    for h in plan.halfband_taps:
        hh = np.asarray(h, np.float64)
        z = np.exp(-2j * np.pi * np.outer(f / rate, np.arange(hh.size)))
        h_tot *= z @ hh
        rate /= 2.0
    if plan.final_taps is not None:
        hh = np.asarray(plan.final_taps, np.float64)
        z = np.exp(-2j * np.pi * np.outer(f / rate, np.arange(hh.size)))
        h_tot *= z @ hh
    return f, np.abs(h_tot)
