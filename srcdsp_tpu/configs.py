"""The five BASELINE.json evaluation configs as typed presets (SURVEY.md §5).

The reference passes constructor args in C++; here each config is a frozen
dataclass + a builder returning (jitted step fn, example input, metadata).
`bench/run.py` consumes these for throughput numbers; `tests/e2e/` runs
reduced-size versions against the C++ oracle.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ConfigSpec:
    name: str
    description: str
    build: Callable[..., "BuiltConfig"]


@dataclasses.dataclass
class BuiltConfig:
    step: Callable          # jitted (inputs...) -> outputs
    example: tuple          # example inputs
    samples_per_call: int   # input samples consumed per step call
    meta: dict


def _rng_planes(n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal(n).astype(np.float32)


def build_config1(n: int = 1 << 20, use_pallas: bool = False,
                  interpret: bool = False) -> BuiltConfig:
    """Single-channel 64-tap FIR lowpass + 2x decimate (+NCO mix fused)."""
    from srcdsp_tpu.ops.nco import freq_to_word
    from srcdsp_tpu.ops.window import lowpass

    t, m = 64, 2
    taps = lowpass(t, 0.2)
    word = int(freq_to_word(0.11))

    if use_pallas:
        from srcdsp_tpu.kernels.mixfir import make_mix_fir_kernel, mix_fir_decim_pallas
        out_tile = 512
        b_rows = min(32, max(1, n // (out_tile * m)))
        k = make_mix_fir_kernel(taps, m, out_tile=out_tile, b_rows=b_rows,
                                interpret=interpret)
        n = (n // k.block_in()) * k.block_in()
        word0 = (-k.hist * word) % (1 << 32)
        planes = jnp.asarray(
            np.stack([_rng_planes(k.hist + n, 1), _rng_planes(k.hist + n, 2)]))
        step = jax.jit(lambda p: mix_fir_decim_pallas(k, word0, word, p))
        return BuiltConfig(step, (planes,), n,
                           dict(taps=t, decim=m, impl="pallas"))

    from srcdsp_tpu.ops.planes import (
        fused_mix_fir_decim_planes, phase_coef_matrix, plane_hist_len)
    coef = jnp.asarray(phase_coef_matrix(taps, m))
    h = plane_hist_len(t, m)
    word0 = jnp.asarray((-h * word) % (1 << 32), jnp.uint32)
    xr = jnp.asarray(_rng_planes(h + n, 1))[None]
    xi = jnp.asarray(_rng_planes(h + n, 2))[None]
    step = jax.jit(lambda r, i: fused_mix_fir_decim_planes(
        coef, word0, jnp.asarray(word, jnp.uint32), r, i, m))
    return BuiltConfig(step, (xr, xi), n, dict(taps=t, decim=m, impl="xla"))


def build_config2(n: int = 1 << 18, channels: int = 4) -> BuiltConfig:
    """NCO mix + 128-tap FIR + rational 3/4 resample, 4 channels."""
    from srcdsp_tpu.ops.fir import fir_init, fir_apply
    from srcdsp_tpu.ops.nco import freq_to_word, nco_init, nco_apply
    from srcdsp_tpu.ops.resample import resample_init, resample_apply
    from srcdsp_tpu.ops.window import lowpass

    t = 128
    taps = jnp.asarray(lowpass(t, 0.2))
    rtaps = jnp.asarray(lowpass(48, 0.3))
    word = freq_to_word(0.07)
    n = (n // 4) * 4

    def step(nco_s, fir_s, rs_s, x):
        nco_s, m = nco_apply(word, nco_s, x)
        fir_s, y = fir_apply(taps, fir_s, m)
        rs_s, z = resample_apply(rtaps, rs_s, y, up=3, down=4)
        return nco_s, fir_s, rs_s, z

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        (rng.standard_normal((channels, n)) + 1j * rng.standard_normal((channels, n)))
        .astype(np.complex64))
    st = (nco_init((channels,)), fir_init(t, (channels,)),
          resample_init(48, 3, (channels,)))
    return BuiltConfig(jax.jit(step), (*st, x), n * channels,
                       dict(channels=channels, impl="xla"))


def build_config3(n: int = 1 << 18, channels: int = 16,
                  fft_size: int = 4096, num_taps: int = 1024) -> BuiltConfig:
    """Overlap-save FFT convolution (4096-pt), 16 channels."""
    from srcdsp_tpu.ops.fftconv import (
        fftconv_apply, fftconv_init, make_freq_response, default_hop)
    from srcdsp_tpu.ops.window import lowpass

    taps = lowpass(num_taps, 0.1)
    hr = make_freq_response(taps, fft_size)
    hop = default_hop(num_taps, fft_size)
    n = (n // hop) * hop

    def step(st, x):
        return fftconv_apply(hr, num_taps, st, x)

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        (rng.standard_normal((channels, n)) + 1j * rng.standard_normal((channels, n)))
        .astype(np.complex64))
    st = fftconv_init(num_taps, fft_size, (channels,))
    return BuiltConfig(jax.jit(step), (st, x), n * channels,
                       dict(channels=channels, fft=fft_size, impl="xla"))


def build_config4(nsym: int = 2048, channels: int = 32) -> BuiltConfig:
    """FSK demod chain: mix + filter + discriminator + symbol timing."""
    from srcdsp_tpu.chains.fsk import fsk_apply, fsk_init, make_fsk_params
    from srcdsp_tpu.testing.signals import fsk_baseband, random_bits, tone

    decim, sps, dev, center = 4, 8, 0.05, 0.11
    params = make_fsk_params(center, 64, 0.03, decim, sps, dev)
    bits = random_bits(jax.random.PRNGKey(0), (channels, nsym))
    bb = fsk_baseband(bits, decim * sps, dev / decim)
    x = (bb * tone(bb.shape[-1], center)).astype(jnp.complex64)
    st = fsk_init(params, (channels,))
    step = jax.jit(lambda s, xb: fsk_apply(params, s, xb))
    return BuiltConfig(step, (st, x), int(x.shape[-1]) * channels,
                       dict(channels=channels, impl="xla", bits=bits))


def build_config5(frames: int = 512, num_channels: int = 64,
                  mesh=None) -> BuiltConfig:
    """64-channel polyphase channelizer + per-channel PSK demod.

    With `mesh`, runs the distributed path (time-sharded input, all_to_all
    re-shard, channel-sharded demod) — the 2+-host workload on a pod; here
    it runs on whatever devices the mesh holds.
    """
    from srcdsp_tpu.chains.channelizer import (
        channelize_full, design_prototype)
    from srcdsp_tpu.chains.psk import make_psk_params, psk_apply, psk_init

    proto = design_prototype(num_channels, taps_per_phase=8)
    psk = make_psk_params(0.0, decim=1, sps=4, order=4, rrc_span=4)
    n = frames * num_channels
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64))

    if mesh is not None:
        from srcdsp_tpu.dist import channelize_time_sharded, time_sharding

        x = jax.device_put(x, time_sharding(mesh))

        def step(xw):
            bank = channelize_time_sharded(proto, xw, num_channels, mesh)
            st = psk_init(psk, (num_channels,))
            _, out = psk_apply(psk, st, bank)
            return out
    else:
        def step(xw):
            bank = channelize_full(proto, xw, num_channels)
            st = psk_init(psk, (num_channels,))
            _, out = psk_apply(psk, st, bank)
            return out

    return BuiltConfig(jax.jit(step), (x,), n,
                       dict(channels=num_channels, impl="xla",
                            distributed=mesh is not None))


CONFIGS = {
    "config1": ConfigSpec(
        "config1",
        "single-channel 64-tap FIR + 2x decimate (+fused NCO), 1M samples",
        build_config1),
    "config2": ConfigSpec(
        "config2", "NCO + 128-tap FIR + 3/4 resample, 4 channels",
        build_config2),
    "config3": ConfigSpec(
        "config3", "overlap-save FFT conv 4096-pt, 16 channels",
        build_config3),
    "config4": ConfigSpec(
        "config4", "FSK demod chain, 32 channels", build_config4),
    "config5": ConfigSpec(
        "config5", "64-ch polyphase channelizer + PSK demods", build_config5),
}
