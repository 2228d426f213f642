"""Sample types and format conversions (SURVEY.md C1).

The reference library converts between integer IQ wire formats and float
processing formats with scaling and saturation (BASELINE.json north_star:
int16 IQ captures are the recorded-fixture format). Semantics here are the
binding definition for the whole framework — the C++ oracle in cpp/oracle
implements the *same* rules, so integer paths are bit-exact across the two:

    int16 -> float:  y = x / scale                  (exact in float32)
    float -> int16:  y = clip(rint(x * scale), -32768, 32767)

`rint` is round-half-to-even (the IEEE default on both numpy and C++
`std::nearbyint` in the default rounding mode), which keeps the two sides
bit-identical without any platform-specific rounding flags.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Processing dtype for the whole framework: complex64 == (float32 I, float32 Q).
# float32 is the TPU VPU/MXU native wide type; the int16 path exists only at
# the capture-file boundary.
CF32 = jnp.complex64
F32 = jnp.float32
I16 = jnp.int16

#: Default full-scale for int16 IQ captures: int16 full scale maps to 1.0.
DEFAULT_SCALE = 32767.0

INT16_MIN = -32768
INT16_MAX = 32767


def int16_to_complex64(iq: jnp.ndarray, scale: float = DEFAULT_SCALE) -> jnp.ndarray:
    """Interleaved int16 IQ ``[..., 2*N]`` or split ``[..., N, 2]`` -> complex64 ``[..., N]``.

    Accepts either an interleaved last axis (even = I, odd = Q) or an explicit
    trailing axis of size 2.
    """
    if iq.shape[-1] != 2:
        if iq.shape[-1] % 2 != 0:
            raise ValueError(f"interleaved IQ length must be even, got {iq.shape}")
        iq = iq.reshape(*iq.shape[:-1], iq.shape[-1] // 2, 2)
    f = iq.astype(F32) / F32(scale)
    return (f[..., 0] + 1j * f[..., 1]).astype(CF32)


def complex64_to_int16(x: jnp.ndarray, scale: float = DEFAULT_SCALE, interleave: bool = True) -> jnp.ndarray:
    """complex64 ``[..., N]`` -> int16 IQ, saturating.

    Returns ``[..., 2*N]`` interleaved if `interleave` else ``[..., N, 2]``.
    Rounding is round-half-to-even; saturation clips to [-32768, 32767],
    matching the C++ oracle bit-for-bit.
    """
    i = jnp.clip(jnp.rint(jnp.real(x) * F32(scale)), INT16_MIN, INT16_MAX)
    q = jnp.clip(jnp.rint(jnp.imag(x) * F32(scale)), INT16_MIN, INT16_MAX)
    out = jnp.stack([i, q], axis=-1).astype(I16)
    if interleave:
        out = out.reshape(*out.shape[:-2], -1)
    return out


# numpy twins, used by file I/O and fixture generation (host side).

def np_int16_to_complex64(iq: np.ndarray, scale: float = DEFAULT_SCALE) -> np.ndarray:
    if iq.shape[-1] != 2:
        iq = iq.reshape(*iq.shape[:-1], iq.shape[-1] // 2, 2)
    f = iq.astype(np.float32) / np.float32(scale)
    return (f[..., 0] + 1j * f[..., 1]).astype(np.complex64)


def np_complex64_to_int16(x: np.ndarray, scale: float = DEFAULT_SCALE, interleave: bool = True) -> np.ndarray:
    i = np.clip(np.rint(x.real * np.float32(scale)), INT16_MIN, INT16_MAX)
    q = np.clip(np.rint(x.imag * np.float32(scale)), INT16_MIN, INT16_MAX)
    out = np.stack([i, q], axis=-1).astype(np.int16)
    if interleave:
        out = out.reshape(*out.shape[:-2], -1)
    return out


# A finite float32-max sentinel for masked reductions (jnp.inf breaks
# under accumulation in some kernels; a shared constant stops per-module
# magic numbers drifting).
F32_BIG = np.float32(3.4e38)
