"""Digital down-converter (beyond parity): tune + filter + decimate to
the minimum rate, auto-designed.

The composition every receiver starts with, packaged: give a center
frequency and a bandwidth, get a streaming `(state, block) -> (state,
block)` chain of the u32-exact NCO and the multistage decimation planner
(ops.decimplan — halfband cascade + residual polyphase at a fraction of
the single-stage MACs):

    ddc = make_ddc(center=0.21, bandwidth=0.004, atten_db=70)
    state = ddc_init(ddc)
    state, y = ddc_apply(ddc, state, block)   # y at rate fs/ddc.decim

The decimation factor is chosen automatically: the largest D with the
protected band [0, bandwidth/2] still inside (0, 0.5/D) plus a guard
(the band edge must stay clear of the folding edge for a realizable
transition), capped by `max_decim`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from srcdsp_tpu.ops.decimplan import (
    DecimPlan, DecimPlanState, decim_plan_apply, decim_plan_init,
    plan_decimation,
)
from srcdsp_tpu.ops.nco import NcoState, freq_to_word, nco_apply, nco_init

__all__ = ["DdcParams", "DdcState", "make_ddc", "ddc_init", "ddc_apply"]


class DdcParams(NamedTuple):
    freq_word: jax.Array
    plan: DecimPlan
    decim: int


class DdcState(NamedTuple):
    nco: NcoState
    plan: DecimPlanState


def make_ddc(center: float, bandwidth: float, atten_db: float = 70.0,
             guard: float = 0.25, max_decim: int = 4096) -> DdcParams:
    """center/bandwidth in cycles/sample at the input rate. `guard` is
    the fraction of the output Nyquist left for the transition band
    (passband edge <= (1-guard) * 0.5/D)."""
    half_bw = bandwidth / 2.0
    if not 0.0 < half_bw < 0.5 * (1.0 - guard):
        raise ValueError(f"bandwidth {bandwidth} not in (0, "
                         f"{1.0 - guard})")
    d = int((1.0 - guard) * 0.5 / half_bw)
    d = max(1, min(d, max_decim))
    while d > 1 and not 0.0 < half_bw < 0.5 / d:
        d -= 1
    if d < 2:
        raise ValueError("bandwidth too wide to decimate: filter directly")
    plan = plan_decimation(d, passband=half_bw, atten_db=atten_db)
    return DdcParams(freq_word=jnp.asarray(freq_to_word(-center)),
                     plan=plan, decim=d)


def ddc_init(params: DdcParams, channel_shape: tuple = ()) -> DdcState:
    return DdcState(nco=nco_init(channel_shape),
                    plan=decim_plan_init(params.plan, channel_shape))


def ddc_apply(params: DdcParams, state: DdcState, x: jax.Array
              ) -> tuple[DdcState, jax.Array]:
    """x: [..., N] with N % decim == 0 -> [..., N/decim] at baseband."""
    nco_s, mixed = nco_apply(params.freq_word, state.nco, x)
    plan_s, y = decim_plan_apply(params.plan, state.plan, mixed)
    return DdcState(nco=nco_s, plan=plan_s), y
