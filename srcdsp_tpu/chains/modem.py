"""Serving-speed coherent coded modem (receive side).

The round-4 gap this closes: the framework's fastest FEC path (the QC
layered LDPC kernel, 7.44 Gb/s at B=4096) was consumed by no chain — the
only end-to-end coded link was the FSK one, demod-rate-bound at 32
samples per CODED bit. This module composes the serving receive modem:

    planes [C, 2, hist+N]
      --(kernels/mixfir MC kernel: NCO mix + RRC matched filter +
         decimate-to-symbol-rate, one pallas_call)--> symbol planes
      --(demap.qam_llr_bitplanes: exact per-axis max-log, 2-D
         elementwise only)--> LLR bit-planes
      --(kernels/ldpc_pallas.make_qc_decoder_t: layered min-sum,
         column-major)--> (bits_t, ok)

at 2 input samples/symbol and log2(M) bits/symbol — the demod:decode
rate ratio that actually feeds the QC decoder at multi-Gb/s (the FSK
link spends 32 samples per coded bit; QAM16 at sps=2 spends 0.5).

LAYOUT IS THE DESIGN. The first cut of this pipeline (row-major LLRs
into make_qc_decoder) spent 2.3 ms/call on relayouts against 0.69 ms of
actual decode (profiled at C=8, B=4096, n=1536). This version makes the
whole chain layout-coherent:

- Bit-plane BICM interleaver: symbol s of a codeword carries label bit
  b (MSB first) = cw[b*spc + s], spc = n/log2(M) symbols per codeword.
  A bit interleaver between FEC and mapper is standard BICM practice;
  choosing THIS one makes the LLR assembly a pure concatenation of the
  demapper's bit-planes — no elementwise interleave anywhere.
  `map_codewords_to_symbols` is the TX-side convention keeper.
- Column-major decode: symbols transpose once ([C, nw, spc] ->
  [spc, C*nw], the small tensor — 4x smaller than the LLRs), demap runs
  in that layout, bit-planes concatenate to llr_t [n, B], and
  make_qc_decoder_t consumes/produces column-major with zero pads or
  transposes.

This is the stationary-clock serving tier (fixed tuning words, known
symbol phase — the BASELINE config-4 framing): carrier/timing
acquisition lives in chains/tracking*.py and hands the locked
parameters here. Alignment (`lag`, symbols) is a static build argument:
the RRC(x)RRC cascade delay is a whole number of symbols when the tx
and rx pulses share an odd length with (T-1) % sps == 0; resolve it
once on the pulse cascade (bench/modem_onchip.py pattern).

Reference parity: SURVEY.md C9 (PSK demod, config-5 per-channel shape)
composed with X19/X27 FEC — the coherent sibling of
bench/coded_link_onchip.py.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.demap import qam_llr_bitplanes
from srcdsp_tpu.kernels.ldpc_pallas import QcPlan, make_qc_decoder_t
from srcdsp_tpu.kernels.mixfir import (make_mix_fir_kernel_mc,
                                       mix_fir_decim_pallas_mc)
from srcdsp_tpu.ldpc import LdpcCode

__all__ = ["make_coherent_modem", "map_codewords_to_symbols"]


def map_codewords_to_symbols(cw, order: int) -> jnp.ndarray:
    """TX-side bit-plane mapping: cw [..., n] -> Gray symbol indices
    [..., n/log2(order)] with symbol s taking label bit b (MSB first)
    from cw[..., b*spc + s] — the interleaver the modem's demap
    concatenation inverts for free (module docstring)."""
    cw = jnp.asarray(cw)
    bps = int(order).bit_length() - 1
    n = cw.shape[-1]
    if n % bps:
        raise ValueError(f"n={n} not a multiple of bits/symbol {bps}")
    spc = n // bps
    planes = cw.astype(jnp.int32).reshape(*cw.shape[:-1], bps, spc)
    w = (2 ** np.arange(bps - 1, -1, -1)).astype(np.int32)
    return jnp.einsum("...bs,b->...s", planes, jnp.asarray(w))


def make_coherent_modem(taps, dwords, sps: int, order: int,
                        code: LdpcCode, plan: QcPlan, *, nw: int,
                        lag: int = 0, iters: int = 6,
                        out_tile: int = 512, b_rows: int = 32,
                        precision=jax.lax.Precision.HIGHEST,
                        b_tile: int = 128,
                        interpret: bool = False):
    """Build the coherent QAM/PSK coded receive pipeline.

    taps: RRC matched filter (odd length; decimation = `sps` takes the
    front end straight to symbol rate). dwords: [C] u32 per-channel
    tuning words (fixed bank, like the ctaps serving path). order:
    square QAM size (4 = QPSK). code/plan: the QC LDPC pair
    (make_qc_ldpc + plan_qc). nw: codewords per channel per call
    (C*nw % b_tile == 0). lag: symbol offset of the first codeword
    symbol in the front end's output (cascade group delay).

    Returns (pipeline, hist): pipeline(planes [C, 2, hist+N]) ->
    (bits_t [n, C*nw] int32 column-major — codeword r = c*nw + w is
    column r; symbols mapped per map_codewords_to_symbols — and
    ok [C*nw] bool). Jit once by the caller; N/sps must cover
    lag + nw*n/log2(order) symbols and be a multiple of
    b_rows*out_tile*sps.
    """
    dwords = np.asarray(dwords, np.uint32)
    num_channels = int(dwords.shape[0])
    n = plan.nb * plan.z
    bps = int(order).bit_length() - 1
    if n % bps:
        raise ValueError(f"n={n} not a multiple of bits/symbol {bps}")
    spc = n // bps                          # symbols per codeword
    batch = num_channels * nw
    if batch % b_tile:
        raise ValueError(f"C*nw = {batch} not a multiple of b_tile "
                         f"{b_tile}")
    kernel = make_mix_fir_kernel_mc(
        taps, sps, num_channels, out_tile=out_tile, b_rows=b_rows,
        precision=precision, interpret=interpret)
    dec = make_qc_decoder_t(code, plan, iters=iters, b_tile=b_tile,
                            interpret=interpret)
    # per-channel phase words: channel streams start at plane index 0 =
    # global sample -hist (the carried-history convention), so the
    # word0 seen by the kernel backs the phase up by hist samples
    words0 = np.asarray([(-kernel.hist * int(w)) % (1 << 32)
                         for w in dwords], np.uint32)

    def to_cols(y):
        y = jax.lax.slice_in_dim(y, lag, lag + nw * spc, axis=-1)
        # [C, nw, spc] -> [spc, C*nw]: the ONE transpose in the chain,
        # on the symbol planes (4x smaller than the LLRs)
        return y.reshape(num_channels, nw, spc).transpose(2, 0, 1) \
                .reshape(spc, batch)

    def pipeline(planes):
        yr, yi = mix_fir_decim_pallas_mc(kernel, words0, dwords, planes)
        llr_t = jnp.concatenate(
            qam_llr_bitplanes(to_cols(yr), to_cols(yi), order), axis=0)
        return dec(llr_t)                   # (bits_t [n, B], ok [B])

    return pipeline, kernel.hist
