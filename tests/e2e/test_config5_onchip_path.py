"""Config-5 on-chip path correctness: matmul bank + planes PSK, real data.

Builds a wideband of QPSK channels, channelizes with the restricted-op-set
matmul bank, demodulates with the plane-form PSK demod, and checks SER —
the same math that bench/run.py config5_onchip times on the chip.
"""

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.chains.channelizer import design_prototype
from srcdsp_tpu.chains.fsk_planes import make_timing_tone
from srcdsp_tpu.chains.psk import (
    constellation_offset, diff_decode, diff_encode, make_psk_params,
)
from srcdsp_tpu.chains.psk_planes import psk_demod_planes
from srcdsp_tpu.ops.channelize_planes import make_channelize_planes
from srcdsp_tpu.ops.fir import fir_full
from srcdsp_tpu.ops.nco import TWO_PI
from srcdsp_tpu.ops.resample import resample_full
from srcdsp_tpu.testing.signals import tone


def _ser(b, d, settle=30):
    best = 1.0
    for lag in range(-32, 33):
        bs, rs = settle + max(lag, 0), settle + max(-lag, 0)
        n = min(len(b) - bs, len(d) - rs)
        if n <= 0:
            continue
        best = min(best, float(np.mean(b[bs:bs + n] != d[rs:rs + n])))
    return best


def _modulated_wideband(m, nsym, order, sps, key=0):
    """QPSK-per-channel wideband fixture + the tx data."""
    data = jax.random.randint(jax.random.PRNGKey(key), (m, nsym), 0, order)
    tx = diff_encode(data, order)
    off = constellation_offset(order)
    sym = jnp.exp(1j * TWO_PI * (tx.astype(jnp.float32) + off) / order)
    pp = make_psk_params(0.0, decim=1, sps=sps, order=order, rrc_span=4)
    bb = resample_full(pp.taps, sym.astype(jnp.complex64), up=sps, down=1)
    proto = design_prototype(m, taps_per_phase=8)
    n = bb.shape[-1] * m
    wb = jnp.zeros((n,), jnp.complex64)
    for c in range(m):
        u = resample_full(proto, bb[c], up=m, down=1) * m
        wb = wb + u * tone(n, c / m)
    return data, proto, wb, off


def test_config5_onchip_path_ser_zero():
    m, nsym, order, sps = 8, 256, 4, 4
    key = jax.random.PRNGKey(0)
    data = jax.random.randint(key, (m, nsym), 0, order)
    tx = diff_encode(data, order)
    off = constellation_offset(order)
    sym = jnp.exp(1j * TWO_PI * (tx.astype(jnp.float32) + off) / order)
    pp = make_psk_params(0.0, decim=1, sps=sps, order=order, rrc_span=4)
    # channel baseband at sps*2 samples/symbol... channel rate = fs/m, and
    # per-channel signaling at sps samples/symbol of the CHANNEL rate
    bb = resample_full(pp.taps, sym.astype(jnp.complex64), up=sps, down=1)
    proto = design_prototype(m, taps_per_phase=8)
    n = bb.shape[-1] * m
    wb = jnp.zeros((n,), jnp.complex64)
    for c in range(m):
        u = resample_full(proto, bb[c], up=m, down=1) * m
        wb = wb + u * tone(n, c / m)
    bank = jax.jit(make_channelize_planes(proto, m))
    yr, yi = bank(jnp.real(wb).astype(jnp.float32),
                  jnp.imag(wb).astype(jnp.float32))
    cr, ci = yr.T, yi.T                     # [M, K]
    # matched filter at the channel rate (plane form via two real FIRs)
    mf = jnp.asarray(pp.taps)
    crf = jnp.real(fir_full(mf, (cr + 1j * ci).astype(jnp.complex64)))
    cif = jnp.imag(fir_full(mf, (cr + 1j * ci).astype(jnp.complex64)))
    k = crf.shape[-1] - (crf.shape[-1] % sps)
    crf, cif = crf[:, :k].astype(jnp.float32), cif[:, :k].astype(jnp.float32)
    tc, ts = make_timing_tone(k, sps)
    acc, (idx, soft) = psk_demod_planes(
        crf, cif, sps, order, jnp.asarray(tc), jnp.asarray(ts), offset=off)
    for c in range(m):
        d = np.asarray(diff_decode(idx[c], order))
        assert _ser(np.asarray(data[c]), d) == 0.0, f"channel {c}"


def test_fused_bank_psk_stats_ser_zero():
    """Fused bank+PSK-stats kernel (interpret) + 3-op tail: SER 0 on the
    modulated fixture, matching the composed bank -> psk_demod_planes path
    (the config-5 serving chain with the epilogue fused in-kernel)."""
    from srcdsp_tpu.chains.psk_planes import psk_demod_bank_stats
    from srcdsp_tpu.kernels.bank_pallas import (
        make_bank_psk_kernel, phase_major)

    m, nsym, order, sps = 8, 256, 4, 4
    data, proto, wb, off = _modulated_wideband(m, nsym, order, sps)
    n = wb.shape[-1]

    b_k = 128
    kb, hist_cols = make_bank_psk_kernel(proto, m, sps=sps, order=order,
                                         b_k=b_k, interpret=True)
    k = (n // m // b_k) * b_k
    planes = jnp.stack([jnp.real(wb), jnp.imag(wb)]).astype(jnp.float32)
    pad = jnp.zeros((2, hist_cols * m), jnp.float32)
    xin = jnp.concatenate([pad, planes[:, :k * m]], axis=-1)
    y, stats = kb(phase_major(xin, m, hist_cols))
    _, (idx, _) = psk_demod_bank_stats(y[:m], y[m:], stats, sps, order,
                                       offset=off)
    assert stats.shape == (k // b_k, m, 128)
    for c in range(m):
        d = np.asarray(diff_decode(idx[c], order))
        assert _ser(np.asarray(data[c]), d) == 0.0, f"channel {c}"


def test_bank_psk_kernel_bank_output_matches_plain():
    """The stats variant's bank output is identical to make_bank_kernel's."""
    from srcdsp_tpu.kernels.bank_pallas import (
        make_bank_kernel, make_bank_psk_kernel, phase_major)

    m, b_k = 8, 128
    proto = design_prototype(m, taps_per_phase=4)
    rng = np.random.default_rng(5)
    k = 4 * b_k
    k0, hist_cols = make_bank_kernel(proto, m, b_k=b_k, interpret=True)
    k1, hist_cols1 = make_bank_psk_kernel(proto, m, sps=4, b_k=b_k,
                                          interpret=True)
    assert hist_cols == hist_cols1
    x = jnp.asarray(rng.standard_normal((2, (hist_cols + k) * m))
                    .astype(np.float32))
    xp = phase_major(x, m, hist_cols)
    y_plain = k0(xp)
    y_stats, _ = k1(xp)
    np.testing.assert_array_equal(np.asarray(y_plain), np.asarray(y_stats))


def test_fused_bank_psk_stats_bf16_emulated_ser_zero():
    """bf16 serving margin for the FUSED bank+stats path: emulate the MXU's
    bf16-input rounding by quantizing both the wideband planes and the
    prototype to bfloat16 before the (f32-accumulate) interpret kernel —
    SER must stay 0 on the modulated fixture (the hardware serving config
    runs precision=DEFAULT, bf16 inputs + f32 accumulate)."""
    from srcdsp_tpu.chains.psk_planes import psk_demod_bank_stats
    from srcdsp_tpu.kernels.bank_pallas import (
        make_bank_psk_kernel, phase_major)

    m, nsym, order, sps = 8, 256, 4, 4
    data, proto, wb, off = _modulated_wideband(m, nsym, order, sps, key=1)
    n = wb.shape[-1]

    def q(a):
        return np.asarray(a, np.float32).astype(jnp.bfloat16).astype(
            np.float32)

    proto_q = q(proto)
    b_k = 128
    kb, hist_cols = make_bank_psk_kernel(proto_q, m, sps=sps, order=order,
                                         b_k=b_k, interpret=True)
    k = (n // m // b_k) * b_k
    planes = jnp.asarray(q(jnp.stack([jnp.real(wb), jnp.imag(wb)])))
    pad = jnp.zeros((2, hist_cols * m), jnp.float32)
    xin = jnp.concatenate([pad, planes[:, :k * m]], axis=-1)
    y, stats = kb(phase_major(xin, m, hist_cols))
    _, (idx, _) = psk_demod_bank_stats(y[:m], y[m:], stats, sps, order,
                                       offset=off)
    for c in range(m):
        d = np.asarray(diff_decode(idx[c], order))
        assert _ser(np.asarray(data[c]), d) == 0.0, f"channel {c}"


def test_fused_bank_psk_stats_nearest_pick_ser_zero():
    """interp=False (nearest-offset pick, the cheaper serving tail) also
    holds SER 0 on the modulated fixture."""
    from srcdsp_tpu.chains.psk_planes import psk_demod_bank_stats
    from srcdsp_tpu.kernels.bank_pallas import (
        make_bank_psk_kernel, phase_major)

    m, nsym, order, sps = 8, 256, 4, 4
    data, proto, wb, off = _modulated_wideband(m, nsym, order, sps, key=2)
    n = wb.shape[-1]
    b_k = 128
    kb, hist_cols = make_bank_psk_kernel(proto, m, sps=sps, order=order,
                                         b_k=b_k, interpret=True)
    k = (n // m // b_k) * b_k
    planes = jnp.stack([jnp.real(wb), jnp.imag(wb)]).astype(jnp.float32)
    pad = jnp.zeros((2, hist_cols * m), jnp.float32)
    xin = jnp.concatenate([pad, planes[:, :k * m]], axis=-1)
    y, stats = kb(phase_major(xin, m, hist_cols))
    _, (idx, _) = psk_demod_bank_stats(y[:m], y[m:], stats, sps, order,
                                       offset=off, interp=False)
    for c in range(m):
        d = np.asarray(diff_decode(idx[c], order))
        assert _ser(np.asarray(data[c]), d) == 0.0, f"channel {c}"


def test_fused_bank_psk_stats_class_major_ser_zero():
    """class_major bank kernel + class-major tail: SER 0 and idx identical
    to the standard-layout fused path on the modulated fixture."""
    from srcdsp_tpu.chains.psk_planes import psk_demod_bank_stats
    from srcdsp_tpu.kernels.bank_pallas import (
        make_bank_psk_kernel, phase_major)

    m, nsym, order, sps = 8, 256, 4, 4
    data, proto, wb, off = _modulated_wideband(m, nsym, order, sps, key=3)
    n = wb.shape[-1]
    b_k = 128
    idxs = {}
    for cm in (False, True):
        kb, hist_cols = make_bank_psk_kernel(proto, m, sps=sps, order=order,
                                             b_k=b_k, class_major=cm,
                                             interpret=True)
        k = (n // m // b_k) * b_k
        planes = jnp.stack([jnp.real(wb), jnp.imag(wb)]).astype(jnp.float32)
        pad = jnp.zeros((2, hist_cols * m), jnp.float32)
        xin = jnp.concatenate([pad, planes[:, :k * m]], axis=-1)
        y, stats = kb(phase_major(xin, m, hist_cols))
        _, (idx, _) = psk_demod_bank_stats(
            y[:m], y[m:], stats, sps, order, offset=off,
            interp=False, class_major_b_k=b_k if cm else 0)
        idxs[cm] = np.asarray(idx)
        for c in range(m):
            d = np.asarray(diff_decode(jnp.asarray(idxs[cm][c]), order))
            assert _ser(np.asarray(data[c]), d) == 0.0, f"cm={cm} ch {c}"
    np.testing.assert_array_equal(idxs[False], idxs[True])
