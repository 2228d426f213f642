"""Multi-stage decimation planner (ops/decimplan.py)."""

import numpy as np

import jax.numpy as jnp

from srcdsp_tpu.ops.decimplan import (
    decim_plan_apply, decim_plan_init, plan_decimation, plan_response,
    single_stage_taps,
)
from srcdsp_tpu.testing.signals import tone


def test_plan_structure_and_cost():
    plan = plan_decimation(48, passband=0.008, atten_db=70.0)
    assert len(plan.halfband_taps) == 4 and plan.final_decim == 3
    assert plan.decim == 48
    # the whole point: far cheaper than the reference's single stage
    single = single_stage_taps(48, 0.008, 70.0)
    assert plan.macs_per_input < 0.25 * single, (plan.macs_per_input, single)


def test_power_of_two_plan_has_no_final_stage():
    plan = plan_decimation(16, passband=0.02, atten_db=60.0)
    assert plan.final_taps is None and plan.final_decim == 1
    assert len(plan.halfband_taps) == 4


def test_response_meets_spec():
    plan = plan_decimation(48, passband=0.008, atten_db=70.0)
    f, mag = plan_response(plan, nfreq=1 << 14)
    # passband ripple small
    pb = mag[f <= 0.008]
    assert np.max(np.abs(20 * np.log10(pb))) < 0.5
    # every alias of the passband is attenuated: |f - m/48| <= passband
    alias = np.zeros_like(f, bool)
    for m in range(1, 25):
        alias |= np.abs(f - m / 48.0) <= 0.008
    worst = 20 * np.log10(np.max(mag[alias]) + 1e-300)
    assert worst < -68.0, worst


def test_tone_passthrough_and_alias_rejection():
    plan = plan_decimation(12, passband=0.01, atten_db=70.0)
    st = decim_plan_init(plan)
    n = 12 * 4096
    x = np.asarray(tone(n, 0.006))
    _, y = decim_plan_apply(plan, st, jnp.asarray(x))
    assert y.shape[-1] == n // 12
    mid = np.asarray(y)[512:-512]
    assert np.abs(np.mean(np.abs(mid)) - 1.0) < 0.02   # passband preserved
    # a tone that would alias right onto 0.006 after /12
    x2 = np.asarray(tone(n, 1.0 / 12 - 0.006))
    _, y2 = decim_plan_apply(plan, decim_plan_init(plan), jnp.asarray(x2))
    rej = np.mean(np.abs(np.asarray(y2)[512:-512]))
    assert 20 * np.log10(rej + 1e-12) < -65.0


def test_streaming_matches_oneshot():
    plan = plan_decimation(24, passband=0.012, atten_db=60.0)
    rng = np.random.default_rng(0)
    n = 24 * 1024
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)
    _, one = decim_plan_apply(plan, decim_plan_init(plan), jnp.asarray(x))
    st = decim_plan_init(plan)
    outs = []
    for blk in np.split(x, 4):
        st, y = decim_plan_apply(plan, st, jnp.asarray(blk))
        outs.append(np.asarray(y))
    got = np.concatenate(outs)
    np.testing.assert_allclose(got, np.asarray(one), atol=2e-6)


def test_multichannel_vmap_shapes():
    plan = plan_decimation(8, passband=0.03, atten_db=60.0)
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((3, 8 * 512)) + 1j *
         rng.standard_normal((3, 8 * 512))).astype(np.complex64)
    st = decim_plan_init(plan, channel_shape=(3,))
    _, y = decim_plan_apply(plan, st, jnp.asarray(x))
    assert y.shape == (3, 512)
