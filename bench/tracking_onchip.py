"""On-chip probe: the closed-loop tracking chains (plane forms) on the
axon TPU. Correctness-gated like the other sequential-tier probes: the
chip's decisions must match the CPU tier exactly; throughput is reported
as a secondary number (the per-symbol scan is latency-bound by nature —
this is the correctness tier, not the 30 Gs/s serving path).

Usage: python bench/tracking_onchip.py [psk|fsk] [channels] [blocks]
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import statistics
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _force(y):
    leaf = jax.tree_util.tree_leaves(y)[0]
    try:
        return np.asarray(leaf[tuple(slice(0, 1) for _ in leaf.shape)])
    except Exception:
        return np.asarray(leaf)


def _warp_clock(x, amp, period):
    n = np.arange(len(x) - int(np.ceil(amp)) - 1, dtype=np.float64)
    t = n + amp * np.sin(2 * np.pi * n / period)
    i0 = np.floor(t).astype(np.int64)
    f = t - i0
    return ((1 - f) * x[i0] + f * x[i0 + 1]).astype(np.complex64)


def main_ffpsk(channels=8, blocks=8):
    """Feedforward block-parallel tracker (chains/feedforward.py): the
    open-loop serving-rate alternative to the per-symbol scans. Same
    fixture class (sinusoidally warped clock + CFO), chip decisions
    gated against the same graph on CPU, slope-timed aggregate rate."""
    from srcdsp_tpu.chains.feedforward import ff_psk_demod_planes
    from srcdsp_tpu.chains.psk import make_psk_params
    from srcdsp_tpu.ops.fir import fir_full
    from srcdsp_tpu.ops.resample import resample_full

    cpu = jax.local_devices(backend="cpu")[0]
    order, sps, block_est = 4, 4, 128
    n = blocks * (1 << 16)
    params = make_psk_params(0.0, decim=1, sps=sps, order=order)
    with jax.default_device(cpu):
        rng = np.random.default_rng(0)
        nsym = n // sps + 64
        data = rng.integers(0, order, (channels, nsym))
        sym = np.exp(2j * np.pi * (data + 0.5) / order)
        shaped = np.asarray(jax.vmap(
            lambda s: resample_full(params.taps, s, up=sps, down=1))(
                jnp.asarray(sym.astype(np.complex64))))
        x = np.stack([_warp_clock(shaped[c], 1.5, 2048.0)
                      for c in range(channels)])
        x = x * np.exp(2j * np.pi * 1e-4
                       * np.arange(x.shape[-1]))[None, :]
        y = np.asarray(jax.vmap(
            lambda v: fir_full(params.taps, v, decim=1))(jnp.asarray(
                x.astype(np.complex64))))
    k = (y.shape[-1] // block_est) * block_est
    yr = np.ascontiguousarray(y.real[:, :k]).astype(np.float32)
    yi = np.ascontiguousarray(y.imag[:, :k]).astype(np.float32)

    fn = jax.jit(lambda a, b: ff_psk_demod_planes(
        a, b, sps, order, block=block_est)[0])
    tpu = jax.devices()[0]
    args_t = tuple(jax.device_put(jnp.asarray(v), tpu) for v in (yr, yi))
    idx_t = np.asarray(fn(*args_t))
    args_c = tuple(jax.device_put(jnp.asarray(v), cpu) for v in (yr, yi))
    idx_c = np.asarray(fn(*args_c))
    match = bool(np.array_equal(idx_t, idx_c))
    # SER vs tx (resolve rotation + whole-symbol lag on one channel)
    best = None
    for lag in range(0, 24):
        m = min(idx_t.shape[-1] - lag, nsym) - 16
        for rot in range(order):
            err = int(((idx_t[0, lag: lag + m] + rot) % order
                       != data[0, :m]).sum())
            if best is None or err < best[0]:
                best = (err, m)
    ser = best[0] / best[1]

    def region(kc):
        t0 = time.perf_counter()
        out = None
        for _ in range(kc):
            out = fn(*args_t)
        _force(out)
        return time.perf_counter() - t0

    from slope import calibrated_slope
    t, _k = calibrated_slope(region, trials=5)
    msps = channels * k / t / 1e6 if t else float("nan")
    print(json.dumps({
        "probe": "tracking_ffpsk_onchip", "channels": channels,
        "samples_per_call": k, "decisions_match_cpu": match,
        "ser_ch0": ser, "ms_per_call": round((t or 0) * 1e3, 3),
        "aggregate_msamples_per_s": round(msps, 2),
    }), flush=True)


def main_ffragged(channels=8, blocks=8):
    """Ragged feedforward tracker under a SUSTAINED 3000-ppm clock (the
    closed-loop skip/stuff tier's gate class, unbounded net drift): chip
    decisions AND validity mask gated against the same graph on CPU,
    compacted SER reported, slope-timed aggregate rate."""
    from srcdsp_tpu.chains.feedforward import ff_psk_demod_ragged
    from srcdsp_tpu.chains.psk import make_psk_params
    from srcdsp_tpu.chains.tracking import compact_ragged
    from srcdsp_tpu.ops.fir import fir_full
    from srcdsp_tpu.ops.resample import resample_full

    cpu = jax.local_devices(backend="cpu")[0]
    order, sps, block_est, rho = 4, 4, 128, 3e-3
    n = blocks * (1 << 16)
    params = make_psk_params(0.0, decim=1, sps=sps, order=order)
    with jax.default_device(cpu):
        rng = np.random.default_rng(0)
        nsym = int(n * (1 + rho)) // sps + 64
        data = rng.integers(0, order, (channels, nsym))
        sym = np.exp(2j * np.pi * (data + 0.5) / order)
        shaped = np.asarray(jax.vmap(
            lambda s: resample_full(params.taps, s, up=sps, down=1))(
                jnp.asarray(sym.astype(np.complex64))))

        def sustained(v):
            nmax = int((len(v) - 2) / (1 + rho))
            t = np.arange(nmax, dtype=np.float64) * (1 + rho)
            i0 = np.floor(t).astype(np.int64)
            f = t - i0
            return ((1 - f) * v[i0] + f * v[i0 + 1]).astype(np.complex64)

        x = np.stack([sustained(shaped[c]) for c in range(channels)])
        y = np.asarray(jax.vmap(
            lambda v: fir_full(params.taps, v, decim=1))(jnp.asarray(
                x.astype(np.complex64))))
    k = (y.shape[-1] // block_est) * block_est
    yr = np.ascontiguousarray(y.real[:, :k]).astype(np.float32)
    yi = np.ascontiguousarray(y.imag[:, :k]).astype(np.float32)

    fn = jax.jit(lambda a, b: ff_psk_demod_ragged(
        a, b, sps, order, block=block_est)[:3:2])  # (idx, valid)
    tpu = jax.devices()[0]
    args_t = tuple(jax.device_put(jnp.asarray(v), tpu) for v in (yr, yi))
    idx_t, val_t = (np.asarray(v) for v in fn(*args_t))
    args_c = tuple(jax.device_put(jnp.asarray(v), cpu) for v in (yr, yi))
    idx_c, val_c = (np.asarray(v) for v in fn(*args_c))
    match = bool(np.array_equal(idx_t, idx_c)
                 and np.array_equal(val_t, val_c))
    got = compact_ragged(idx_t[0], val_t[0])
    ragged_follows_clock = bool(got.size > k // sps + 10)
    best = None
    for lag in range(0, 24):
        m = min(got.size - lag, nsym) - 16
        for rot in range(order):
            err = int(((got[lag: lag + m] + rot) % order
                       != data[0, :m]).sum())
            if best is None or err < best[0]:
                best = (err, m)
    ser = best[0] / best[1]

    def region(kc):
        t0 = time.perf_counter()
        out = None
        for _ in range(kc):
            out = fn(*args_t)
        _force(out)
        return time.perf_counter() - t0

    from slope import calibrated_slope
    t, _k = calibrated_slope(region, trials=5)
    msps = channels * k / t / 1e6 if t else float("nan")
    print(json.dumps({
        "probe": "tracking_ffpsk_ragged_onchip", "channels": channels,
        "samples_per_call": k, "rho_ppm": rho * 1e6,
        "decisions_match_cpu": match,
        "ragged_count_follows_clock": ragged_follows_clock,
        "ser_ch0": ser, "ms_per_call": round((t or 0) * 1e3, 3),
        "aggregate_msamples_per_s": round(msps, 2),
    }), flush=True)


def main(which="fsk", channels=8, blocks=8):
    from srcdsp_tpu.chains.fsk import make_fsk_params
    from srcdsp_tpu.chains.psk import make_psk_params
    from srcdsp_tpu.chains.tracking_planes import (
        fsk_track_planes_apply, fsk_track_planes_init,
        psk_track_planes_apply, psk_track_planes_init)

    cpu = jax.local_devices(backend="cpu")[0]
    if which == "fsk":
        decim, sps, dev = 2, 8, 0.02
        block = 1 << 14
        params = make_fsk_params(0.0, 64, 0.45 / decim, decim=decim,
                                 sps=sps, dev=dev * decim)
        with jax.default_device(cpu):
            from srcdsp_tpu.testing.signals import fsk_baseband, random_bits
            nsym = blocks * block // (decim * sps) + 64
            bits = random_bits(jax.random.PRNGKey(2), (channels, nsym))
            bb = np.asarray(fsk_baseband(bits, decim * sps, dev))
        x = np.stack([_warp_clock(bb[c], 1.5, 4096.0) for c in
                      range(channels)])
        init = lambda: fsk_track_planes_init(params, channels)
        apply_ = lambda s, p: fsk_track_planes_apply(params, s, p)
    else:
        order, sps = 4, 4
        decim = 1
        block = 1 << 13
        params = make_psk_params(0.0, decim=decim, sps=sps, order=order)
        with jax.default_device(cpu):
            from srcdsp_tpu.chains.psk import diff_encode
            from srcdsp_tpu.ops.resample import resample_full
            nsym = blocks * block // sps + 64
            rng = np.random.default_rng(0)
            data = rng.integers(0, order, (channels, nsym))
            sym = np.exp(2j * np.pi * (data + 0.5) / order)
            clean = np.asarray(jax.vmap(
                lambda s: resample_full(params.taps, s, up=sps, down=1))(
                    jnp.asarray(sym.astype(np.complex64))))
        x = np.stack([_warp_clock(clean[c], 1.5, 2048.0) for c in
                      range(channels)])
        init = lambda: psk_track_planes_init(params, channels)
        apply_ = lambda s, p: psk_track_planes_apply(params, s, p)

    n = blocks * block
    planes = np.stack([x.real, x.imag], axis=1)[:, :, :n].astype(np.float32)

    def run(device):
        with jax.default_device(device):
            st = init()
            step = jax.jit(apply_)
            outs = []
            for b in range(blocks):
                p = jax.device_put(
                    jnp.asarray(planes[:, :, b * block:(b + 1) * block]),
                    device)
                st, out = step(st, p)
                outs.append(np.asarray(out[0]))
        return np.concatenate(outs, axis=-1)

    dec_cpu = run(cpu)
    tpu = jax.devices()[0]
    dec_tpu = run(tpu)
    match = np.array_equal(dec_cpu, dec_tpu)
    mismatch = float(np.mean(dec_cpu != dec_tpu))
    print(json.dumps({"probe": f"tracking_{which}_onchip",
                      "decisions_match_cpu": bool(match),
                      "mismatch_fraction": mismatch}), flush=True)

    # slope timing on the chip
    with jax.default_device(tpu):
        st = init()
        step = jax.jit(apply_)
        p = jax.device_put(jnp.asarray(planes[:, :, :block]), tpu)
        _force(step(st, p))

        def region(k):
            t0 = time.perf_counter()
            y = None
            for _ in range(k):
                y = step(st, p)
            _force(y)
            return time.perf_counter() - t0

        from slope import calibrated_slope
        t, _k = calibrated_slope(region, trials=5)
        if t is None:
            t = float("nan")
    msps = channels * block / t / 1e6
    print(json.dumps({
        "probe": f"tracking_{which}_onchip", "channels": channels,
        "block": block, "ms_per_block": round(t * 1e3, 3),
        "aggregate_msamples_per_s": round(msps, 2),
    }), flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "fsk"
    channels = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    blocks = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    print("backend:", jax.default_backend(), flush=True)
    if which == "ffpsk":
        main_ffpsk(channels, blocks)
    elif which == "ffragged":
        main_ffragged(channels, blocks)
    else:
        main(which, channels, blocks)
