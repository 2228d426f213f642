"""Coded-OFDM receive modem at serving speed (round 5): the
multicarrier sibling of chains/modem.py — composes the on-chip OFDM
front end (chains/ofdm_planes.py, X61) with the bit-plane BICM
interleaver and the column-major QC layered LDPC decoder (X50's
layout-coherence machinery, reused verbatim).

    planes [C, K] (aligned, pilot symbol first)
      --(CP strip + active-bin DFT matmul + one-tap EQ + DD common
         phase)--> soft subcarrier symbols [C, S, na]
      --(flatten to the per-channel symbol stream, ONE transpose on the
         small symbol planes)--> [spc, C*nw]
      --(demap.qam_llr_bitplanes concat)--> llr_t [n, B]
      --(make_qc_decoder_t)--> (bits_t, ok)

The TX convention is exactly `modem.map_codewords_to_symbols` laid
row-major onto the OFDM data grid (symbol stream index s -> OFDM symbol
s // n_active, subcarrier slot s % n_active); trailing grid slots
beyond the last codeword are filler.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.chains.ofdm import OfdmSpec
from srcdsp_tpu.chains.ofdm_planes import make_ofdm_rx_planes
from srcdsp_tpu.demap import qam_llr_bitplanes
from srcdsp_tpu.kernels.ldpc_pallas import QcPlan, make_qc_decoder_t
from srcdsp_tpu.ldpc import LdpcCode

__all__ = ["make_ofdm_coded_modem"]


def make_ofdm_coded_modem(spec: OfdmSpec, code: LdpcCode, plan: QcPlan,
                          *, num_channels: int, nw: int, iters: int = 6,
                          b_tile: int = 128, n_pilot: int = 1,
                          precision=jax.lax.Precision.HIGHEST,
                          interpret: bool = False):
    """Build the coded-OFDM receive pipeline.

    Returns pipeline(yr, yi, pr, pi) -> (bits_t [n, C*nw] column-major,
    ok [C*nw]): yr/yi [C, K] aligned sample planes whose first symbol
    is the known pilot (pr/pi [n_active] constellation planes); each
    channel carries nw codewords of n = plan.nb*plan.z bits mapped per
    modem.map_codewords_to_symbols onto the flattened data grid. K must
    cover (n_pilot + ceil(nw*spc/n_active)) OFDM symbols.
    """
    na = int(np.asarray(spec.active).size)
    n = plan.nb * plan.z
    bps = int(spec.order).bit_length() - 1
    if n % bps:
        raise ValueError(f"n={n} not a multiple of bits/symbol {bps}")
    spc = n // bps
    batch = num_channels * nw
    if batch % b_tile:
        raise ValueError(f"C*nw = {batch} not a multiple of b_tile "
                         f"{b_tile}")
    rx = make_ofdm_rx_planes(spec, precision=precision,
                             n_pilot=n_pilot)
    dec = make_qc_decoder_t(code, plan, iters=iters, b_tile=b_tile,
                            interpret=interpret)

    def to_cols(z):
        c, s, _ = z.shape
        flat = z.reshape(c, s * na)[:, : nw * spc]
        return flat.reshape(c, nw, spc).transpose(2, 0, 1) \
                   .reshape(spc, batch)

    def pipeline(yr, yi, pr, pi):
        _idx, (zr, zi) = rx(yr, yi, pr, pi)
        llr_t = jnp.concatenate(
            qam_llr_bitplanes(to_cols(zr), to_cols(zi), spec.order),
            axis=0)
        return dec(llr_t)

    return pipeline
