"""Benchmark/profiling CLI (SURVEY.md §5, C12): run a named config preset.

    python bench/run.py config1 [--pallas] [--iters 20] [--profile DIR]

Prints one JSON metrics line per run (Msamples/s, plus cost-analysis FLOPs
when available). `bench.py` at the repo root remains the driver's one-line
entry; this CLI is the human-facing harness over all five presets.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# invoked as `python bench/run.py`: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "1")


def _enable_compile_cache() -> None:
    import jax
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass



def _force(y):
    """Drain the device queue: fetch a tiny corner of the first output.

    2026-08-19 finding: `jax.block_until_ready` NO LONGER waits for
    queued executions on the tunnel backend (the round-2 harness measured
    0.023 ms/iter for a 536 MB/call FFT — pure enqueue cost). Execution
    is in-order, so one host FETCH of any part of the last output forces
    the whole queue (verified: total time grows linearly in call count
    under this force). Every timed region must end in a fetch."""
    import jax
    import numpy as np

    leaf = jax.tree_util.tree_leaves(y)[0]
    try:
        corner = leaf[tuple(slice(0, 1) for _ in leaf.shape)]
        return np.asarray(corner)
    except Exception:       # restricted-backend slice gap: fetch it all
        return np.asarray(leaf)


def _time_median(step, args, iters: int, trials: int = 7):
    """Median SLOPE of `trials` paired timed regions (variance control:
    single draws through the tunnel vary +-30%; per-region sync latency
    was measured at ~25-35 ms on 2026-08-19). Each trial times `iters`
    and `2*iters` dispatches, both ending in a forced fetch (_force), and
    reports (T2 - T1)/iters — the fixed enqueue+sync cost cancels in the
    difference, leaving true per-call time. Returns
    (median_secs_per_iter, [min, max] secs)."""
    import time

    import numpy as np

    def region(k):
        t0 = time.perf_counter()
        y = None
        for _ in range(k):
            y = step(*args)
        _force(y)
        return time.perf_counter() - t0

    region(1)               # warm-up / compile
    ts = []
    for _ in range(trials):
        t1 = region(iters)
        t2 = region(2 * iters)
        ts.append((t2 - t1) / iters)
    return float(np.median(ts)), [min(ts), max(ts)]

def run_config(name: str, use_pallas: bool = False, iters: int = 20,
               profile_dir: str | None = None, **kw) -> dict:
    import jax
    from srcdsp_tpu.configs import CONFIGS

    spec = CONFIGS[name]
    try:
        if name == "config1":
            built = spec.build(use_pallas=use_pallas, **kw)
        else:
            built = spec.build(**kw)
        step, args = built.step, built.example
        out = step(*args)
        jax.block_until_ready(out)
    except Exception as e:
        # the tunnel TPU backend lacks complex64/conv/scan; the complex-dtype
        # configs run there via the *_onchip variants instead
        return {"config": name, "platform": jax.default_backend(),
                "status": "unsupported_on_backend", "error": str(e)[:160]}

    if profile_dir:
        with jax.profiler.trace(profile_dir):
            out = step(*args)
            _force(out)         # block_until_ready no longer drains

    best, _rng = _time_median(step, args, iters)

    msps = built.samples_per_call / best / 1e6
    rec = {
        "config": name,
        "platform": jax.default_backend(),
        "msamples_per_s": round(msps, 2),
        "ms_per_iter": round(best * 1e3, 3),
        "samples_per_call": built.samples_per_call,
        "impl": built.meta.get("impl"),
    }
    try:
        lowered = jax.jit(step).lower(*args)
        cost = lowered.compile().cost_analysis()
        if cost and "flops" in cost:
            rec["gflops_per_s"] = round(cost["flops"] / best / 1e9, 1)
    except Exception:
        pass
    return rec


def run_fft(iters: int = 20, n: int = 4096, batch: int = 8192,
            fused: bool = True, fft_bf16: bool = False,
            natural_order: bool = True) -> dict:
    """FFT GFLOP/s (BASELINE.json metric). fused=True runs the batched
    Pallas kernel (whole transform in VMEM, karatsuba lane stage);
    fused=False is the round-1 XLA plane path. natural_order=False skips
    the final unscramble transpose (transform-only rate).

    Batch sweep (2026-08-17, f32 5NlogN GFLOP/s): 1024 -> 210.8/232.4
    (natural/transform-only), 4096 -> 345.9/419.7, 8192 -> 395.0/586.9 —
    dispatch-bound below ~16M samples like every chain; 8192 is the
    serving batch."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    from srcdsp_tpu.ops.fft_planes import fft_planes_flops, make_fft_planes

    if fused:
        from srcdsp_tpu.kernels.fft_pallas import make_fft_kernel
        prec = (jax.lax.Precision.DEFAULT if fft_bf16
                else jax.lax.Precision.HIGHEST)
        k = make_fft_kernel(n, b_frames=16, precision=prec,
                            natural_order=natural_order)
        batch = (batch // k.b_frames) * k.b_frames
        # args-form jit: the twiddle constants ride as arguments — jit
        # closure constants are re-shipped through the tunnel every call
        # (BASELINE.md round-3 "closure constants" note)
        fft_p = jax.jit(k.fn_p)
        consts = jax.device_put(k.consts)
        fft = lambda xr, xi: fft_p(consts, xr, xi)
    else:
        fft = jax.jit(make_fft_planes(n))
    rng = np.random.default_rng(0)
    xr = jax.device_put(jnp.asarray(rng.standard_normal((batch, n)), jnp.float32))
    xi = jax.device_put(jnp.asarray(rng.standard_normal((batch, n)), jnp.float32))
    best, _rng = _time_median(fft, (xr, xi), iters)
    return {
        "config": "fft",
        "platform": jax.default_backend(),
        "impl": ("pallas_bf16" if fft_bf16 else "pallas_f32") if fused
                else "xla_planes",
        "natural_order": natural_order,
        "fft_size": n,
        "batch": batch,
        "ms_per_iter": round(best * 1e3, 3),
        "gflops_per_s_matmul": round(fft_planes_flops(batch, n) / best / 1e9, 1),
        "gflops_per_s_5nlogn": round(5 * n * np.log2(n) * batch / best / 1e9, 1),
    }


def run_config4_onchip(iters: int = 10, channels: int = 10,
                       n_per_ch: int = 1 << 24, fused: bool = True,
                       bf16: bool = True, ctaps: bool = True) -> dict:
    """The north-star chain fully on-chip. ctaps=True (serving default,
    round 4) bakes the per-channel NCO into complex taps — no per-sample
    mix at all (kernels/fsk_ctaps; bits IDENTICAL to the runtime-mix
    kernel on the modulated fixture, +25% slope A/B). fused=True runs the
    runtime-tuned single-kernel front-end; fused=False composes the MC
    mixfir kernel with XLA demod ops. bf16 runs the FIR matmuls at
    bf16-input/f32-accumulate — bits IDENTICAL to f32-HIGHEST
    (BASELINE.md 2026-08-17) at +10% throughput.
    Reports AGGREGATE Msamples/s across channels on this one chip."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    from srcdsp_tpu.ops.nco import freq_to_word
    from srcdsp_tpu.ops.window import lowpass

    decim, sps = 4, 8
    taps = lowpass(64, 0.03)
    words = np.asarray(
        [freq_to_word(-0.05 - 0.01 * c) for c in range(channels)], np.uint32)
    rng = np.random.default_rng(0)
    prec = (jax.lax.Precision.DEFAULT if bf16
            else jax.lax.Precision.HIGHEST)

    if fused and ctaps:
        from srcdsp_tpu.kernels.fsk_ctaps import (
            fsk_demod_ctaps, make_fsk_ctaps_kernel)
        fn, hist = make_fsk_ctaps_kernel(taps, words, decim, sps,
                                         out_tile=512, b_rows=32,
                                         precision=prec, class_major=True)
        blk = 32 * 512 * decim
        n = (n_per_ch // blk) * blk
        planes = jax.device_put(jnp.asarray(
            rng.standard_normal((channels, 2, hist + n)).astype(np.float32)))
        step = jax.jit(lambda p: fsk_demod_ctaps(
            fn, hist, 512, p, sps, class_major=True))
    elif fused:
        from srcdsp_tpu.kernels.fsk_fused import (
            fsk_demod_fused, make_fsk_mc_kernel)
        fn, hist = make_fsk_mc_kernel(taps, decim, channels, sps,
                                      out_tile=512, b_rows=32,
                                      precision=prec, class_major=True)
        blk = 32 * 512 * decim
        n = (n_per_ch // blk) * blk
        words0 = np.asarray([(-hist * int(w)) % (1 << 32) for w in words],
                            np.uint32)
        planes = jax.device_put(jnp.asarray(
            rng.standard_normal((channels, 2, hist + n)).astype(np.float32)))
        step = jax.jit(lambda p: fsk_demod_fused(
            fn, hist, 512, words0, words, p, sps, class_major=True))
    else:
        from srcdsp_tpu.chains.fsk_planes import (
            fsk_demod_planes, make_timing_tone)
        from srcdsp_tpu.kernels.mixfir import make_mix_fir_kernel_mc
        k = make_mix_fir_kernel_mc(taps, decim, channels, out_tile=512,
                                   b_rows=32)
        n = (n_per_ch // k.block_in()) * k.block_in()
        words0 = np.asarray([(-k.hist * int(w)) % (1 << 32) for w in words],
                            np.uint32)
        planes = jax.device_put(jnp.asarray(
            rng.standard_normal((channels, 2, k.hist + n)).astype(np.float32)))
        tc, ts = make_timing_tone(n // decim, sps)
        tc = jax.device_put(jnp.asarray(tc))
        ts = jax.device_put(jnp.asarray(ts))
        step = jax.jit(lambda p: fsk_demod_planes(
            k, words0, words, p, sps, tc, ts))
    best, _rng = _time_median(step, (planes,), iters)
    agg = channels * n / best / 1e6
    return {
        "config": "config4_onchip",
        "platform": jax.default_backend(),
        "channels": channels,
        "impl": (("fused_ctaps_" if ctaps else "fused_kernel_")
                 + ("bf16" if bf16 else "f32")) if fused else "kernel+xla",
        "aggregate_msamples_per_s": round(agg, 1),
        "ms_per_iter": round(best * 1e3, 3),
        "per_chip_vs_125msps_target": round(agg / 125.0, 2),
    }


def run_config2_onchip(iters: int = 10, n: int = 1 << 25,
                       fused: bool = True, channels: int = 1,
                       hist_round: int = 128, bf16: bool = False,
                       preframed: bool = False) -> dict:
    """Config 2 on-chip. fused=True folds the whole chain (NCO mix +
    128-tap FIR + 3/4 resample) into ONE stride-L Toeplitz kernel via
    combined taps hc = h_resample conv up_3(h_fir) — one pallas_call, one
    HBM pass; channels>1 uses the multi-channel grid (BASELINE config 2 is
    4 channels; n is PER CHANNEL). fused=False is the round-1 two-kernel
    path (mix+FIR kernel, HBM round-trip, resampler kernel).

    Call sizing: the chain carries ~2.6 ms fixed per-call overhead through
    the tunnel, so it is dispatch-bound below ~8M samples/call (2026-08-17
    medians: 4M -> 1185, 16M -> 2700, 32M -> 3167 Ms/s; device-side rate
    4.1 Gs/s). 32M (n = 1<<25, the function default) is the serving size.

    bf16=True runs the combined-taps matmuls at bf16-input/f32-accumulate:
    measured 2.43x (13.69 vs 5.64 Gs/s, 10/20-call slope regions at 32M
    samples/call, 2026-08-20) at 51.6 dB vs f32-HIGHEST on the same
    input — the long combined-taps bands are MXU-pass-bound, so the
    6->1 pass cut more than doubles the chain. (Short 3/6-call regions
    read 18-92 Gs/s — sync jitter; disregarded.) The f32-HIGHEST tier
    stays the >110 dB oracle-accuracy default; bf16 is the demod-feeding
    serving option (config-3's precedent)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    from srcdsp_tpu.kernels.resample_pallas import (
        combine_fir_resample_taps, make_mix_resample_kernel,
        make_mix_resample_kernel_mc, mix_resample_pallas,
        mix_resample_pallas_mc)
    from srcdsp_tpu.ops.nco import freq_to_word
    from srcdsp_tpu.ops.window import lowpass

    word = int(freq_to_word(0.07))
    rng = np.random.default_rng(0)

    if preframed:
        # round-5 transfer #3 of the window-copy result: producer ships
        # [NT, span] frames, kernel is pure stride-L banded matmuls + a
        # per-ROW phasor (kernels/resample_preframed.py). Interleaved
        # slope A/B (bench/ab_resample_preframed.py, 2026-08-20):
        # bf16 43.4 Gs/s @out_tile=2304 (3.69x the fused leg same-run,
        # 3.2x the round-4 13.7 Gs/s serving record, dup 8.3%);
        # f32-HIGHEST 7.83 @1152 (+48%; 1536+ exceeds the 16M VMEM
        # scoped limit at f32 band width). SNR 47.9 dB (bf16) / 132.9 dB
        # (f32) vs the fused leg on the same stream.
        from srcdsp_tpu.kernels.mixfir_preframed import frame_planes
        from srcdsp_tpu.kernels.resample_preframed import (
            make_resample_preframed_kernel)
        hc = combine_fir_resample_taps(lowpass(128, 0.2), lowpass(48, 0.3),
                                       up=3)
        ot = 2304 if bf16 else 1152
        prec2 = (jax.lax.Precision.DEFAULT if bf16
                 else jax.lax.Precision.HIGHEST)
        dt = jnp.bfloat16 if bf16 else jnp.float32
        fn, hist, stride, span = make_resample_preframed_kernel(
            hc, word, up=3, down=4, out_tile=ot, b_rows=32,
            block_cols=192, precision=prec2, in_dtype=dt)
        blk = 32 * stride
        n = (n // blk) * blk
        word0 = (-hist * word) % (1 << 32)
        planes = jnp.asarray(
            rng.standard_normal((2, hist + n)).astype(np.float32))
        frames = jax.block_until_ready(jax.jit(
            lambda p: frame_planes(p, stride, span).astype(dt))(planes))
        w0 = jnp.asarray(np.asarray([[word0]], np.uint32).view(np.int32))
        f = jax.jit(fn)
        args = (w0, frames[0], frames[1])
        best, _rng2 = _time_median(f, args, iters)
        return {
            "config": "config2_onchip",
            "platform": jax.default_backend(),
            "impl": ("preframed_ctaps_bf16" if bf16
                     else "preframed_ctaps"),
            "channels": 1,
            "msamples_per_s": round(n / best / 1e6, 1),
            "ms_per_iter": round(best * 1e3, 3),
        }

    if fused and channels > 1:
        hc = combine_fir_resample_taps(lowpass(128, 0.2), lowpass(48, 0.3),
                                       up=3)
        k = make_mix_resample_kernel_mc(hc, up=3, down=4,
                                        num_channels=channels, out_tile=384,
                                        b_rows=24, block_cols=192,
                                        hist_round=hist_round)
        n = (n // k.block_in()) * k.block_in()
        words = np.asarray([(word + 7919 * c) % (1 << 32)
                            for c in range(channels)], np.uint32)
        words0 = np.asarray([(-k.hist * int(w)) % (1 << 32) for w in words],
                            np.uint32)
        planes = jax.device_put(jnp.asarray(rng.standard_normal(
            (channels, 2, k.hist + n)).astype(np.float32)))
        f = jax.jit(lambda p: mix_resample_pallas_mc(k, words0, words, p))
        args = (planes,)
    elif fused:
        hc = combine_fir_resample_taps(lowpass(128, 0.2), lowpass(48, 0.3),
                                       up=3)
        # block_cols=192 (round 3): narrower bands issue bspan=512 rows
        # per output instead of 768 — bit-identical output, +7.5% on the
        # interleaved slope A/B (5.62 vs 5.23 Gs/s); hist stays 128-
        # aligned (hist=144 re-probed 2026-08-19: Mosaic HTTP 500 even in
        # the manual-DMA form)
        prec2 = (jax.lax.Precision.DEFAULT if bf16
                 else jax.lax.Precision.HIGHEST)
        k = make_mix_resample_kernel(hc, up=3, down=4, out_tile=384,
                                     b_rows=24, block_cols=192,
                                     precision=prec2,
                                     hist_round=hist_round)
        n = (n // k.block_in()) * k.block_in()
        word0 = (-k.hist * word) % (1 << 32)
        planes = jax.device_put(jnp.asarray(
            rng.standard_normal((2, k.hist + n)).astype(np.float32)))
        f = jax.jit(lambda p: mix_resample_pallas(k, word0, word, p))
        args = (planes,)
    else:
        from srcdsp_tpu.kernels.mixfir import (
            make_mix_fir_kernel, mix_fir_decim_pallas)
        k1 = make_mix_fir_kernel(lowpass(128, 0.2), 1, out_tile=512, b_rows=32)
        k2 = make_mix_resample_kernel(lowpass(48, 0.3), up=3, down=4,
                                      out_tile=384, b_rows=8, block_cols=384)
        # chain granularity: n divisible by both kernels' input blocks
        import math
        blk = math.lcm(k1.block_in(), k2.block_in())
        n = (n // blk) * blk
        word0 = (-k1.hist * word) % (1 << 32)
        planes = jax.device_put(jnp.asarray(
            rng.standard_normal((2, k1.hist + n)).astype(np.float32)))
        z2 = jnp.zeros((2, k2.hist), jnp.float32)

        def step(p):
            yr, yi = mix_fir_decim_pallas(k1, word0, word, p)
            xin = jnp.concatenate([z2, jnp.concatenate([yr, yi], 0)], axis=-1)
            return mix_resample_pallas(k2, 0, 0, xin)

        f = jax.jit(step)
        args = (planes,)

    best, _rng = _time_median(f, args, iters)
    return {
        "config": "config2_onchip",
        "platform": jax.default_backend(),
        "impl": (("fused_combined_taps_bf16" if bf16
                  else "fused_combined_taps") if fused else "two_kernels"),
        "channels": channels,
        "msamples_per_s": round(channels * n / best / 1e6, 1),
        "ms_per_iter": round(best * 1e3, 3),
    }


def run_config3_onchip(iters: int = 10, channels: int = 16,
                       fft_size: int = 4096, num_taps: int = 1024,
                       n_per_ch: int = 1 << 23, fused: bool = True,
                       fft_bf16: bool = False, b_frames: int = 16) -> dict:
    """Config 3 fully on-chip. fused=True runs the single-HBM-pass Pallas
    overlap-save kernel (slab DMA -> VMEM frames -> four-step MXU FFT ->
    freq multiply -> inverse, all channels in one grid); fused=False is the
    XLA plane path with a per-channel Python loop (the round-1 baseline).
    fft_bf16 runs the kernel matmuls at bf16-input/f32-accumulate."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    from srcdsp_tpu.ops.window import lowpass

    taps = lowpass(num_taps, 0.1)
    rng = np.random.default_rng(0)

    if fused:
        from srcdsp_tpu.kernels.fftconv_pallas import (
            fftconv_pallas, make_fftconv_kernel)
        prec = (jax.lax.Precision.DEFAULT if fft_bf16
                else jax.lax.Precision.HIGHEST)
        # karatsuba: 3-matmul complex form for the lane-contracting stages —
        # A/B medians: f32 +6% wall / +10% device, bf16 within noise, SNR
        # unchanged (bench/results_round2.jsonl). Serving default.
        # pipelined (auto-on here): dual-BlockSpec input staging double-
        # buffers HBM loads behind the matmuls — +16% f32 / +21% bf16,
        # outputs bit-identical (bench/results_round2.jsonl).
        k = make_fftconv_kernel(taps, fft_size, num_channels=channels,
                                b_frames=b_frames, precision=prec,
                                karatsuba=True)
        hop = k.hop
        n = (n_per_ch // k.block_in()) * k.block_in()
        x = jax.device_put(jnp.asarray(rng.standard_normal(
            (channels, 2, k.overlap + n)).astype(np.float32)))
        step = jax.jit(lambda xp: fftconv_pallas(k, xp))
        args = (x,)
    else:
        from srcdsp_tpu.ops.fftconv_planes import make_fftconv_planes
        fn, hop = make_fftconv_planes(taps, fft_size)
        n = (n_per_ch // hop) * hop
        overlap = fft_size - hop

        def all_ch(xr, xi):
            outs = [fn(xr[c], xi[c]) for c in range(channels)]
            return (jnp.stack([o[0] for o in outs]),
                    jnp.stack([o[1] for o in outs]))

        xr = jax.device_put(jnp.asarray(
            rng.standard_normal((channels, overlap + n)).astype(np.float32)))
        xi = jax.device_put(jnp.asarray(
            rng.standard_normal((channels, overlap + n)).astype(np.float32)))
        step = jax.jit(all_ch)
        args = (xr, xi)

    best, _rng = _time_median(step, args, iters)
    agg = channels * n / best / 1e6
    # 5NlogN-terms GFLOP/s: 2 FFTs (fwd+inv) per frame of fft_size samples,
    # frames advance by hop
    gflops_5nlogn = (agg * 1e6 / hop) * 2 * 5 * fft_size * np.log2(fft_size) / 1e9
    return {
        "config": "config3_onchip",
        "platform": jax.default_backend(),
        "channels": channels, "fft_size": fft_size, "num_taps": num_taps,
        "hop": hop,
        "impl": ("pallas_bf16" if fft_bf16 else "pallas_f32") if fused
                else "xla_planes",
        "aggregate_msamples_per_s": round(agg, 1),
        "gflops_per_s_5nlogn": round(gflops_5nlogn, 1),
        "ms_per_iter": round(best * 1e3, 3),
    }


def run_config5_onchip(iters: int = 10, num_channels: int = 64,
                       frames: int = 1 << 19, use_pallas_bank: bool = True,
                       bank_bf16: bool = True, b_k: int = 512,
                       fused_demod: bool = True) -> dict:
    """Config 5 fully on-chip: matmul-form 64-ch polyphase bank + per-channel
    plane-form QPSK demod. use_pallas_bank swaps in the single-HBM-pass
    Pallas bank kernel; bank_bf16 runs its matmul in bf16 (the serving
    config — SER 0 validated on the modulated fixture; pass False for
    6-pass f32). fused_demod computes the PSK timing/V&V sums INSIDE the
    bank kernel (make_bank_psk_kernel) so the XLA tail is pick+slice only."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    from srcdsp_tpu.chains.channelizer import design_prototype
    from srcdsp_tpu.chains.fsk_planes import make_timing_tone
    from srcdsp_tpu.chains.psk_planes import psk_demod_planes
    from srcdsp_tpu.ops.channelize_planes import make_channelize_planes

    m = num_channels
    sps = 4
    k = (frames // sps) * sps
    n = k * m
    proto = design_prototype(m, taps_per_phase=8)
    tc, ts = make_timing_tone(k, sps)
    tcj = jax.device_put(jnp.asarray(tc))
    tsj = jax.device_put(jnp.asarray(ts))

    if use_pallas_bank and fused_demod:
        from srcdsp_tpu.chains.psk_planes import psk_demod_bank_stats
        from srcdsp_tpu.kernels.bank_pallas import make_bank_psk_kernel
        prec = (jax.lax.Precision.DEFAULT if bank_bf16
                else jax.lax.Precision.HIGHEST)
        kb, hist_cols = make_bank_psk_kernel(proto, m, sps=sps, order=4,
                                             b_k=b_k, precision=prec,
                                             class_major=True)
        k = (k // b_k) * b_k
        n = k * m

        def step(xp):
            y, stats = kb(xp)                   # [2M, K] + fused sums
            return psk_demod_bank_stats(y[:m], y[m:], stats, sps, 4,
                                        offset=0.5, class_major_b_k=b_k)

        rng = np.random.default_rng(0)
        xp = jax.device_put(jnp.asarray(
            rng.standard_normal((2, m, hist_cols + k)).astype(np.float32)))
        f = jax.jit(step)
        args = (xp,)
    elif use_pallas_bank:
        from srcdsp_tpu.kernels.bank_pallas import make_bank_kernel
        prec = (jax.lax.Precision.DEFAULT if bank_bf16
                else jax.lax.Precision.HIGHEST)
        kb, hist_cols = make_bank_kernel(proto, m, b_k=b_k, precision=prec)
        k = (k // b_k) * b_k
        n = k * m
        tc, ts = make_timing_tone(k, sps)
        tcj = jax.device_put(jnp.asarray(tc))
        tsj = jax.device_put(jnp.asarray(ts))

        def step(xp):
            y = kb(xp)                          # [2M, K] channel-major
            return psk_demod_planes(y[:m], y[m:], sps, 4, tcj, tsj,
                                    offset=0.5)

        rng = np.random.default_rng(0)
        xp = jax.device_put(jnp.asarray(
            rng.standard_normal((2, m, hist_cols + k)).astype(np.float32)))
        f = jax.jit(step)
        args = (xp,)
    else:
        bank = make_channelize_planes(proto, m)

        def step(xr, xi):
            br, bi = bank(xr, xi)               # [K, M]
            cr, ci = br.T, bi.T                 # [M, K] channel-major
            return psk_demod_planes(cr, ci, sps, 4, tcj, tsj, offset=0.5)

        rng = np.random.default_rng(0)
        xr = jax.device_put(jnp.asarray(rng.standard_normal(n).astype(np.float32)))
        xi = jax.device_put(jnp.asarray(rng.standard_normal(n).astype(np.float32)))
        f = jax.jit(step)
        args = (xr, xi)

    best, _rng = _time_median(f, args, iters)
    return {
        "config": "config5_onchip",
        "platform": jax.default_backend(),
        "channels": m,
        "bank": ("pallas_bf16" if bank_bf16 else "pallas_f32")
                if use_pallas_bank else "xla",
        "demod": ("fused_stats" if (use_pallas_bank and fused_demod)
                  else "xla_planes"),
        "wideband_msamples_per_s": round(n / best / 1e6, 1),
        "ms_per_iter": round(best * 1e3, 3),
    }


def run_soak(buffers: int = 32, n_per_buf: int = 1 << 23) -> dict:
    """Sustained-streaming soak: back-to-back buffers through the config-1
    kernel with per-buffer phase continuation (no per-trial sync), plus a
    finiteness check — the production serving pattern. Dispatch pipelining
    makes this FASTER than the synchronized benchmark loops."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    from srcdsp_tpu.kernels.mixfir import make_mix_fir_kernel
    from srcdsp_tpu.ops.nco import freq_to_word
    from srcdsp_tpu.ops.window import lowpass

    taps = lowpass(64, 0.2)
    word = int(freq_to_word(0.11))
    k = make_mix_fir_kernel(taps, 2, out_tile=512, b_rows=32)
    n = (n_per_buf // k.block_in()) * k.block_in()
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((2, k.hist + n)).astype(np.float32)))
    dw = jnp.asarray(np.uint32(word).view(np.int32)).reshape(1, 1)
    f = jax.jit(k.fn)
    w0s = [jnp.asarray(np.uint32(((b * n - k.hist) * word) % (1 << 32))
                       .view(np.int32)).reshape(1, 1)
           for b in range(buffers)]
    _force(f(w0s[0], dw, x))
    t0 = time.perf_counter()
    for b in range(buffers):
        yr, yi = f(w0s[b], dw, x)
    _force((yr, yi))            # drain: block_until_ready no longer does
    dt = time.perf_counter() - t0
    return {
        "config": "soak",
        "platform": jax.default_backend(),
        "buffers": buffers,
        "gb_processed": round(buffers * n * 8 / 1e9, 2),
        "sustained_msamples_per_s": round(buffers * n / dt / 1e6, 1),
        "all_finite": bool(jnp.all(jnp.isfinite(yr))
                           and jnp.all(jnp.isfinite(yi))),
    }


def run_accuracy() -> dict:
    """SNR delta vs the C++ oracle (BASELINE.json metric) on the config-1
    chain, plus config-4 BER on a clean capture.

    The config-1 plane chain runs on the default backend (the real chip
    when present); the complex-dtype parts (config-4 chain, resampler) are
    pinned to the CPU backend — the axon subset has no complex64, and the
    accuracy statement is about the math, not the device."""
    import jax
    import numpy as np
    from srcdsp_tpu import oracle
    from srcdsp_tpu.configs import build_config1, build_config4

    cpu = jax.devices("cpu")[0]

    built = build_config1(n=1 << 16)
    xr, xi = built.example
    yr, yi = built.step(xr, xi)
    got = np.asarray(yr[0]) + 1j * np.asarray(yi[0])
    from srcdsp_tpu.ops.nco import freq_to_word
    from srcdsp_tpu.ops.planes import plane_hist_len
    from srcdsp_tpu.ops.window import lowpass
    x = (np.asarray(xr[0]) + 1j * np.asarray(xi[0])).astype(np.complex64)
    word = int(freq_to_word(0.11))
    hist = plane_hist_len(64, 2)
    mixed, _ = oracle.nco_mix(x, (-hist * word) % (1 << 32), word)
    ref = oracle.fir(mixed, lowpass(64, 0.2), decim=2)[hist // 2:]
    err = ref - got
    snr = 10 * np.log10(np.mean(np.abs(ref) ** 2) / np.mean(np.abs(err) ** 2))

    with jax.default_device(cpu):
        built4 = build_config4(nsym=512, channels=8)
        st, xc = built4.example
        bits = np.asarray(built4.meta["bits"])
        _, (rx, _) = built4.step(st, xc)
        rx = np.asarray(rx)
    bers = []
    for ch in range(rx.shape[0]):
        best = 1.0
        for lag in range(-16, 17):
            bs, rs = 16 + max(lag, 0), 16 + max(-lag, 0)
            nsym = min(bits.shape[-1] - bs, rx.shape[-1] - rs)
            best = min(best, float(np.mean(
                bits[ch, bs:bs + nsym] != rx[ch, rs:rs + nsym])))
        bers.append(best)
    # resampler chain SNR vs oracle (config 2 shape)
    from srcdsp_tpu.ops.resample import resample_full
    rng = np.random.default_rng(1)
    xr2 = (rng.standard_normal(1 << 14) + 1j * rng.standard_normal(1 << 14)
           ).astype(np.complex64)
    rt = lowpass(48, 0.3 / 4)
    import jax.numpy as jnp
    with jax.default_device(cpu):
        got_r = np.asarray(resample_full(jnp.asarray(rt), jnp.asarray(xr2),
                                         3, 4))
    ref_r = oracle.resample(xr2, rt, 3, 4)
    err_r = ref_r - got_r
    snr_r = 10 * np.log10(np.mean(np.abs(ref_r) ** 2)
                          / np.mean(np.abs(err_r) ** 2))
    return {
        "config": "accuracy",
        "platform": jax.default_backend(),
        "config1_snr_vs_oracle_db": round(float(snr), 1),
        "config2_resample_snr_vs_oracle_db": round(float(snr_r), 1),
        "config4_clean_ber_worst_channel": max(bers),
    }


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config", choices=["config1", "config2", "config3",
                                      "config4", "config4_onchip", "config5",
                                      "config2_onchip", "config2_onchip_bf16",
                                      "config2_onchip_preframed",
                                      "config3_onchip",
                                      "config5_onchip", "fft", "accuracy",
                                      "soak", "all"])
    p.add_argument("--pallas", action="store_true",
                   help="use the Pallas fused kernel (config1)")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--profile", default=None,
                   help="write an XProf trace to this directory")
    p.add_argument("--out", default=None,
                   help="append JSON records to this file as well")
    args = p.parse_args(argv)
    _enable_compile_cache()

    # onchip variants (and accuracy, whose config-1 planes run on the
    # chip) go FIRST: a failed complex-dtype attempt in config2..5 can
    # wedge the tunnel backend for every subsequent device_put
    names = (["config1", "config2_onchip", "config3_onchip", "config4_onchip",
              "config5_onchip", "fft", "accuracy", "config2", "config3",
              "config4", "config5"]
             if args.config == "all" else [args.config])
    for name in names:
        try:
            if name == "fft":
                rec = run_fft(iters=args.iters)
            elif name == "soak":
                rec = run_soak()
            elif name == "config2_onchip":
                rec = run_config2_onchip(iters=args.iters)
            elif name == "config2_onchip_bf16":
                rec = run_config2_onchip(iters=args.iters, bf16=True)
            elif name == "config2_onchip_preframed":
                rec = run_config2_onchip(iters=args.iters, bf16=True,
                                         preframed=True)
            elif name == "config3_onchip":
                rec = run_config3_onchip(iters=args.iters)
            elif name == "config4_onchip":
                rec = run_config4_onchip(iters=args.iters)
            elif name == "config5_onchip":
                rec = run_config5_onchip(iters=args.iters)
            elif name == "accuracy":
                rec = run_accuracy()
            else:
                rec = run_config(name, use_pallas=args.pallas,
                                 iters=args.iters, profile_dir=args.profile)
        except Exception as e:
            rec = {"config": name, "status": "failed_on_backend",
                   "error": str(e)[:160]}
        line = json.dumps(rec)
        print(line)
        if args.out:
            with open(args.out, "a") as f:
                f.write(line + "\n")


if __name__ == "__main__":
    main()
