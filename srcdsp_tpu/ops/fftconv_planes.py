"""On-chip overlap-save FFT convolution (SURVEY.md C6; BASELINE config 3).

Plane-form, restricted-op-set version of ops.fftconv: the overlapped frame
matrix is built WITHOUT gather — when hop divides fft_size, frame k's
samples [k*hop, k*hop + F) are exactly F/hop consecutive hop-rows of the
[K', hop] reshape, so the frame matrix is a concat of F/hop row-shifted
2-D slices. The transform is the four-step MXU FFT (ops.fft_planes);
the inverse runs through the conjugation identity ifft(X) = conj(fft(
conj(X)))/N, so one forward-FFT builder serves both directions.

Semantics: identical causal FIR-from-rest as ops.fftconv (same frames,
same freq response), verified against it and the C++ oracle in tests.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.ops.fft_planes import make_fft_planes
from srcdsp_tpu.types import F32


def make_fftconv_planes(taps, fft_size: int, hop: int | None = None,
                        precision=jax.lax.Precision.HIGHEST):
    """Build the on-chip overlap-save filter.

    Returns (fn, hop) where fn: (xr, xi) [HIST + N] planes -> [N] planes,
    HIST = fft_size - hop (prepend zeros at stream start / carried tail
    when streaming), N % hop == 0. Requires fft_size % hop == 0 for the
    gather-free framing, so hop defaults to the largest power-of-two
    divisor of fft_size that is <= fft_size - num_taps + 1.
    """
    taps = np.asarray(taps)
    t = len(taps)
    max_hop = fft_size - (t - 1)
    if hop is None:
        hop = 1
        while hop * 2 <= max_hop and fft_size % (hop * 2) == 0:
            hop *= 2
    if not 0 < hop <= max_hop:
        raise ValueError(f"hop {hop} not in (0, {max_hop}]")
    if fft_size % hop != 0:
        raise ValueError(f"fft_size {fft_size} % hop {hop} != 0")
    overlap = fft_size - hop
    rows = fft_size // hop
    hfull = np.fft.fft(np.asarray(taps, np.complex128), n=fft_size)
    hr = jnp.asarray(hfull.real.astype(np.float32))
    hi = jnp.asarray(hfull.imag.astype(np.float32))
    fft = make_fft_planes(fft_size, precision=precision)
    inv_n = F32(1.0 / fft_size)

    def fn(xr: jax.Array, xi: jax.Array) -> tuple[jax.Array, jax.Array]:
        total = xr.shape[-1]
        n = total - overlap
        k = n // hop
        # frame matrix [K, F]: concat of `rows` row-shifted hop-blocks of
        # the [K + rows - 1, hop] reshape
        x2r = xr.reshape(-1, hop)
        x2i = xi.reshape(-1, hop)
        fr = jnp.concatenate([x2r[r: r + k] for r in range(rows)], axis=1)
        fi = jnp.concatenate([x2i[r: r + k] for r in range(rows)], axis=1)
        sr, si = fft(fr, fi)
        pr = sr * hr - si * hi
        pi = sr * hi + si * hr
        # ifft via conj: time = conj(fft(conj(spec)))/F
        tr, ti = fft(pr, -pi)
        yr = tr * inv_n
        yi = -ti * inv_n
        # drop the circular-overlap prefix of every frame, flatten
        yr = yr[:, overlap:].reshape(-1)
        yi = yi[:, overlap:].reshape(-1)
        return yr, yi

    return fn, hop
