"""Chirp spread spectrum (CSS, LoRa-class) modem: cyclic-shift chirp
modulation, dechirp-FFT demodulation, preamble sync, and a coded frame
layer (Gray mapping + nibble Hamming FEC + diagonal interleaver +
whitening + CRC-16).

Beyond-parity chain (the reference family stops at narrowband FSK/PSK
demods — SURVEY.md §2 [B]): CSS is the one spread-spectrum family the
repo did not cover (DSSS/FHSS exist), and its receiver is a natural MXU
program — dechirp is one elementwise multiply and the symbol decision is
a DFT, so a batch of symbols demodulates as `[S, N]` planes through the
`fft_planes` matmul factorization (see `css_demod_planes`).

Discrete-time model (critically sampled, 1 sample/chip, N = 2^SF chips
per symbol): the base upchirp is

    u[n] = exp(j*pi*n^2/N),    n = 0..N-1

whose instantaneous frequency sweeps one full cycle across the symbol.
Data symbol k in [0, N) is the cyclic shift x_k[n] = u[(n+k) mod N];
because N is even, (n+k+N)^2/N differs from (n+k)^2/N by an even
integer, so the mod is phase-transparent and x_k[n] = exp(j*pi*(n+k)^2/N)
exactly. Dechirping with conj(u) gives

    x_k[n]*conj(u[n]) = exp(j*pi*k^2/N) * exp(j*2*pi*k*n/N)

— a pure tone at DFT bin k: the demodulator is dechirp -> N-point DFT ->
argmax. Phases are built from exact integer arithmetic (pi * ((m*m) mod
2N) / N) so f32 never squares large chip indices.

Sync uses the classic up/down-chirp trick: with carrier offset eps (in
bins) and timing offset tau (in chips), a dechirped preamble upchirp
peaks at bin (eps - tau) mod N while a dechirped downchirp peaks at
(eps + tau) mod N — two measurements, two unknowns. The fractional part
of eps comes from the phase advance of the dechirped preamble peak
across consecutive symbols (2*pi*eps per symbol). The frame layer is
LoRa-STYLE, not bit-conformant (no public tables are available in-image;
same policy as the BLE-style link — conventions are documented here and
verified against independently-written scalar-loop twins in
tests/e2e/test_css.py).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.gf2 import crc_init, crc_update, crc_value, make_crc
from srcdsp_tpu.types import CF32, F32


# ---------------------------------------------------------------------------
# chirp synthesis (exact integer phase)
# ---------------------------------------------------------------------------

def _chirp_phase_frac(m: np.ndarray, n: int) -> np.ndarray:
    """phase/(2*pi) of exp(j*pi*m^2/N) as the EXACT fraction
    ((m*m) mod 2N) / 2N — integer arithmetic, so no f32 catastrophe from
    squaring large chip indices (m^2 reaches 2^24 at SF12)."""
    r = (m.astype(np.int64) * m.astype(np.int64)) % (2 * n)
    return r.astype(np.float64) / (2.0 * n)


def base_upchirp(n: int) -> np.ndarray:
    """u[n] = exp(j*pi*n^2/N), complex64 [N]. Host-side constant."""
    fr = _chirp_phase_frac(np.arange(n), n)
    return np.exp(2j * np.pi * fr).astype(np.complex64)


def chirp_symbol(n: int, k: int) -> np.ndarray:
    """x_k[n] = u[(n+k) mod N] = exp(j*pi*(n+k)^2/N), complex64 [N]."""
    fr = _chirp_phase_frac(np.arange(n) + int(k), n)
    return np.exp(2j * np.pi * fr).astype(np.complex64)


class CssParams(NamedTuple):
    sf: int                 # spreading factor: SF bits / symbol
    n: int                  # 2^SF chips per symbol (1 sample/chip)
    cr: int                 # parity bits per nibble codeword (1..4)
    n_up: int               # preamble upchirps
    sync1: int              # sync-word shifts (two known non-zero
    sync2: int              # symbols marking the preamble end)
    upchirp: np.ndarray     # [N] c64 base upchirp u (HOST-side numpy:
    downchirp: np.ndarray   # a jnp complex64 here would land on the
                            # default device at construction and poison
                            # on-chip builders — verify-skill round-5)


def make_css_params(sf: int = 8, cr: int = 4, n_up: int = 8,
                    sync1: int | None = None, sync2: int | None = None
                    ) -> CssParams:
    """Build CSS parameters. sf in [5, 12]; cr parity bits in [1, 4]
    (cr>=3 corrects single bit errors per nibble, cr<=2 detects only).
    Sync shifts default to N/8 and 3N/8 (nonzero, far apart, and far
    from 0 so preamble upchirps can't alias into them)."""
    if not 5 <= sf <= 12:
        raise ValueError(f"sf must be in [5, 12], got {sf}")
    if not 1 <= cr <= 4:
        raise ValueError(f"cr must be in [1, 4], got {cr}")
    n = 1 << sf
    u = base_upchirp(n)
    return CssParams(
        sf=sf, n=n, cr=cr, n_up=n_up,
        sync1=n // 8 if sync1 is None else int(sync1),
        sync2=3 * n // 8 if sync2 is None else int(sync2),
        upchirp=u, downchirp=np.conj(u))


# ---------------------------------------------------------------------------
# modulation / demodulation
# ---------------------------------------------------------------------------

def css_modulate(params: CssParams, shifts: np.ndarray) -> np.ndarray:
    """Symbol shifts [S] in [0, N) -> waveform [S*N] complex64.

    Host-side synthesis (like the other tx chains): exact integer phase
    per (symbol, chip) — no gathers, no accumulated phase error."""
    shifts = np.asarray(shifts, np.int64)
    n = params.n
    m = np.arange(n)[None, :] + shifts[:, None]          # [S, N]
    fr = _chirp_phase_frac(m, n)
    return np.exp(2j * np.pi * fr).astype(np.complex64).reshape(-1)


def css_frames(params: CssParams, x: jax.Array) -> jax.Array:
    """Chip stream [S*N] -> dechirped symbol frames [S, N] (elementwise
    multiply by conj(u); symbol k becomes a tone at bin k)."""
    n = params.n
    s = x.shape[-1] // n
    return x[: s * n].reshape(s, n) * params.downchirp


def css_demod(params: CssParams, x: jax.Array):
    """Demodulate an ALIGNED chip stream [S*N] -> (shifts [S] i32,
    peak [S] c64 — the complex DFT peak, for phase/SNR diagnostics)."""
    return css_demod_frames(params, css_frames(params, x))


def css_demod_frames(params: CssParams, frames: jax.Array):
    """Demodulate pre-dechirped frames [S, N] (css_frames output)."""
    spec = jnp.fft.fft(frames, axis=-1)
    k = jnp.argmax(jnp.abs(spec), axis=-1)
    return k.astype(jnp.int32), jnp.take_along_axis(
        spec, k[:, None], axis=-1)[:, 0]


# ---------------------------------------------------------------------------
# preamble sync
# ---------------------------------------------------------------------------

def _wrap_half(v: np.ndarray | float, n: int):
    """Wrap bin/chip values into [-N/2, N/2)."""
    return (np.asarray(v) + n // 2) % n - n // 2


class CssSync(NamedTuple):
    start: int              # chip index of the first payload sample
    cfo_bins: float         # carrier offset in bins (int + fractional)
    tau: int                # residual integer chip timing (diagnostics)
    ok: bool


def css_preamble(params: CssParams) -> np.ndarray:
    """Transmit preamble: n_up upchirps, the 2-symbol sync word, then
    2 downchirps. [ (n_up+4) * N ] complex64."""
    ups = css_modulate(
        params, [0] * params.n_up + [params.sync1, params.sync2])
    downs = np.conj(css_modulate(params, [0, 0]))
    return np.concatenate([ups, downs])


def preamble_len(params: CssParams) -> int:
    return (params.n_up + 4) * params.n


def css_sync(params: CssParams, x: jax.Array) -> CssSync:
    """Locate the preamble and estimate CFO; returns the payload start.

    Host-side control logic over device-side dechirp/FFT stages (the
    same split as the AIS/BLE/ADS-B receivers): arbitrary N-frames of
    the repeated-upchirp preamble dechirp to a clean tone (contiguous
    identical upchirps form a periodic chirp, so ANY window is a cyclic
    shift), giving a run of equal argmax bins b_up = (eps - tau) mod N.
    The sync word then appears as bins offset by sync1/sync2 from b_up,
    anchoring WHICH preamble symbol each frame is. Dechirping the two
    downchirps with u gives b_dn = (eps + tau) mod N; solving the pair
    (with half-integer ambiguity resolved toward the fractional-phase
    CFO estimate) yields eps and tau."""
    n, nup = params.n, params.n_up
    xx = jnp.asarray(x)
    nsym = int(xx.shape[-1]) // n
    if nsym < nup + 4:
        return CssSync(0, 0.0, 0, False)
    frames = xx[: nsym * n].reshape(nsym, n)
    up_spec = jnp.fft.fft(frames * params.downchirp, axis=-1)
    up_bin = np.asarray(jnp.argmax(jnp.abs(up_spec), axis=-1))
    up_pk = np.asarray(jnp.take_along_axis(
        up_spec, jnp.asarray(up_bin)[:, None], axis=-1)[:, 0])

    # collect runs of (nearly) equal bins in stream order; +-1 slack
    # absorbs a fractional CFO sitting between two bins. Each run >= 3
    # is a preamble CANDIDATE, validated in order by the sync-word
    # check — taking the first validated run (not the globally longest)
    # keeps an early burst from being shadowed by a later one whose
    # straddle frames happen to extend its run (review finding).
    runs = []
    i = 0
    while i < nsym:
        j = i
        while (j + 1 < nsym
               and abs(int(_wrap_half(int(up_bin[j + 1]) - int(up_bin[i]),
                                      n))) <= 1):
            j += 1
        if j - i + 1 >= 3:
            runs.append((i, j - i + 1))
        i = j + 1

    best_i = best_len = None
    sync_end = None
    for ri, rl in runs:
        b_up_c = int(up_bin[ri + rl // 2])
        for f in range(ri + rl - 1, min(ri + rl + 3, nsym - 1)):
            d1 = int(_wrap_half(int(up_bin[f]) - b_up_c - params.sync1,
                                n))
            d2 = int(_wrap_half(int(up_bin[f + 1]) - b_up_c
                                - params.sync2, n))
            if abs(d1) <= 1 and abs(d2) <= 1:
                sync_end = f + 2      # first downchirp frame index
                break
        if sync_end is not None:
            best_i, best_len = ri, rl
            break
    if sync_end is None:
        return CssSync(0, 0.0, 0, False)
    b_up = int(up_bin[best_i + best_len // 2])

    # fractional CFO from the phase advance across the run's interior
    # (2*pi*eps per symbol); the interior avoids the straddled edges
    lo, hi = best_i + 1, best_i + best_len - 1
    if hi > lo:
        rot = up_pk[lo + 1: hi] * np.conj(up_pk[lo: hi - 1])
        eps_frac = float(np.angle(rot.sum()) / (2 * np.pi))
    else:
        eps_frac = 0.0

    # downchirps: dechirp with u over the two grid frames covering them.
    # Whatever the sign of tau, ONE of the two frames lies fully inside
    # the cyclically-contiguous 2-downchirp span (the other straddles a
    # neighbor), so take the frame with the stronger peak.
    if (sync_end + 2) * n > int(xx.shape[-1]):
        return CssSync(0, 0.0, 0, False)
    down = frames[sync_end: sync_end + 2] * params.upchirp
    dn_spec = np.asarray(jnp.fft.fft(down, axis=-1))
    pk = np.abs(dn_spec).max(axis=-1)
    b_dn = int(np.argmax(np.abs(dn_spec[int(np.argmax(pk))])))

    # solve b_up = eps - tau, b_dn = eps + tau (both mod N): the sum
    # fixes 2*eps mod N, so eps is known mod N/2 — assume |eps| < N/4
    # and take the smallest wrapped candidate. The integer part comes
    # from snapping (candidate - eps_frac) to an integer; tau follows
    # from the upchirp equation.
    s = (b_up + b_dn) % n
    c = min((_wrap_half(s / 2.0 + a, n) for a in (0.0, n / 2.0)),
            key=abs)
    eps = round(float(c) - eps_frac) + eps_frac
    tau = int(_wrap_half(round(eps) - b_up, n))
    # payload starts after the 2 downchirps of the frame grid, shifted
    # by the timing offset tau (frame grid index 0 = stream index 0)
    start = (sync_end + 2) * n + tau
    return CssSync(start=int(start), cfo_bins=float(eps),
                   tau=int(tau), ok=True)


def css_derotate(params: CssParams, x: jax.Array,
                 cfo_bins: float) -> jax.Array:
    """Remove a carrier offset of cfo_bins DFT bins (cfo_bins/N cycles
    per chip) from a chip stream."""
    ph = (-2.0 * np.pi * float(cfo_bins) / params.n) \
        * jnp.arange(x.shape[-1], dtype=F32)
    return x * jax.lax.complex(jnp.cos(ph), jnp.sin(ph)).astype(CF32)


# ---------------------------------------------------------------------------
# bit layer: Gray map + nibble Hamming + diagonal interleaver + whitening
# ---------------------------------------------------------------------------

# Hamming parity equations over a nibble d0..d3 (d0 = MSB of the nibble,
# matching the bit order bits_to_nibbles produces). cr parity bits are
# the first cr rows. p0..p2 are the standard Hamming(7,4) equations —
# any single-bit error in (d, p0..p2) has a unique syndrome — and p3
# is overall parity extending to (8,4) SEC-DED.
_PARITY_EQS = np.array([
    [1, 1, 1, 0],   # p0 = d0^d1^d2
    [1, 1, 0, 1],   # p1 = d0^d1^d3
    [1, 0, 1, 1],   # p2 = d0^d2^d3
    [0, 1, 1, 1],   # p3 = d1^d2^d3  (with p0..p2: overall SEC-DED)
], np.int64)


def _parity_eqs(cr: int) -> np.ndarray:
    """Parity equations for a given cr. cr=1 is the single-parity-check
    over ALL four data bits (d_min 2 — the natural detect-only code);
    cr>=2 uses the Hamming rows above (cr=3: d_min 3 single-error
    correcting; cr=4: d_min 4 SEC-DED)."""
    if cr == 1:
        return np.ones((1, 4), np.int64)
    return _PARITY_EQS[:cr]


def hamming_encode_nibbles(nibbles: np.ndarray, cr: int) -> np.ndarray:
    """Nibbles [K, 4] (bits, MSB first) -> codewords [K, 4+cr]
    (data then parity)."""
    nib = np.asarray(nibbles, np.int64)
    par = (nib @ _parity_eqs(cr).T) & 1
    return np.concatenate([nib, par], axis=-1)


def hamming_decode_nibbles(cw: np.ndarray, cr: int) -> np.ndarray:
    """Codewords [K, 4+cr] -> nibbles [K, 4], correcting single bit
    errors when cr >= 3 (syndrome decode over the p0..p2 equations;
    cr <= 2 is detect-only, data bits pass through)."""
    cw = np.asarray(cw, np.int64)
    data, par = cw[:, :4], cw[:, 4:]
    if cr < 3:
        return data
    syn = ((data @ _PARITY_EQS[:3].T) & 1) ^ par[:, :3]   # [K, 3]
    # map syndrome -> error position among the 7 bits (d0..d3, p0..p2):
    # column j of H = _PARITY_EQS[:3] rows for data, identity for parity
    h_cols = np.concatenate([_PARITY_EQS[:3], np.eye(3, dtype=np.int64)],
                            axis=1)                        # [3, 7]
    # syndrome as an integer, position lookup (0 = no error)
    syn_int = syn @ (1 << np.arange(3))
    col_int = (h_cols * (1 << np.arange(3))[:, None]).sum(0)  # [7]
    pos = np.full(8, -1, np.int64)
    for j, c in enumerate(col_int):
        pos[c] = j
    err = pos[syn_int]                                     # [K]
    out = data.copy()
    for j in range(4):                                     # flip data errs
        out[:, j] ^= (err == j)
    return out


def bits_to_nibbles(bits: np.ndarray) -> np.ndarray:
    """Bit vector (len % 4 == 0) -> [K, 4] nibbles, MSB first."""
    b = np.asarray(bits, np.int64)
    return b.reshape(-1, 4)


def gray_encode_shift(w: np.ndarray) -> np.ndarray:
    """Data word -> transmitted shift k with gray(k) = w, so +-1 bin
    errors flip one data bit. Inverse Gray by prefix-XOR."""
    w = np.asarray(w, np.int64)
    # standard iterative inverse: k = w ^ (w>>1) ^ (w>>2) ^ ...
    k = w.copy()
    s = w >> 1
    while s.any():
        k ^= s
        s >>= 1
    return k


def gray_decode_shift(k: np.ndarray) -> np.ndarray:
    """Received shift -> data word: w = k ^ (k >> 1)."""
    k = np.asarray(k, np.int64)
    return k ^ (k >> 1)


def diag_interleave(cw: np.ndarray, sf: int) -> np.ndarray:
    """One block: SF codewords x (4+cr) bits -> (4+cr) symbols x SF
    bits. out[c, r] = cw[(r + c) mod SF, c] — the diagonal rotation
    spreads each codeword across all symbols so one bad symbol costs
    each codeword at most one bit (inside Hamming's correction power
    at cr >= 3)."""
    cw = np.asarray(cw, np.int64)
    nsym = cw.shape[1]
    out = np.empty((nsym, sf), np.int64)
    for c in range(nsym):
        out[c] = cw[(np.arange(sf) + c) % sf, c]
    return out


def diag_deinterleave(sym_bits: np.ndarray, sf: int) -> np.ndarray:
    """Inverse of diag_interleave: [(4+cr), SF] -> [SF, 4+cr]."""
    sym_bits = np.asarray(sym_bits, np.int64)
    nsym = sym_bits.shape[0]
    cw = np.empty((sf, nsym), np.int64)
    for c in range(nsym):
        cw[(np.arange(sf) + c) % sf, c] = sym_bits[c]
    return cw


def whitening_seq(nbits: int, seed: int = 0x1FF) -> np.ndarray:
    """Whitening PN bits from a 9-bit Fibonacci LFSR x^9 + x^5 + 1
    (a maximal m-sequence; repo convention, seeded all-ones).

    Deliberately NOT routed through gf2.make_scrambler: this function's
    contract is the exact output-bit/seed convention documented here
    (LSB-out, right-shift register, arbitrary integer seeds — tested),
    which does not map 1:1 onto the shared scrambler's feedback-out
    state convention; frames are short, so the per-bit loop is fine."""
    state = seed & 0x1FF
    out = np.empty(nbits, np.int64)
    for i in range(nbits):
        out[i] = state & 1
        fb = ((state >> 0) ^ (state >> 4)) & 1     # taps 9, 5
        state = (state >> 1) | (fb << 8)
    return out


_CRC16 = make_crc(0x1021, 16, init=0xFFFF)    # CRC-16/CCITT-FALSE


def crc16_ccitt(bits: np.ndarray) -> int:
    """CRC-16/CCITT-FALSE over a bit vector (MSB-first), poly 0x1021 —
    the house gf2 engine (same machinery as the AIS FCS / BLE CRC-24)."""
    s = crc_update(_CRC16, crc_init(_CRC16),
                   jnp.asarray(np.asarray(bits, np.int32)))
    return int(np.asarray(crc_value(_CRC16, s)))


# ---------------------------------------------------------------------------
# frame layer
# ---------------------------------------------------------------------------

def css_encode_frame(params: CssParams, payload: bytes) -> np.ndarray:
    """Payload bytes -> symbol shifts [S] (implicit-header mode: the
    receiver knows the payload length). Pipeline: bytes -> bits ->
    +CRC16 -> whiten -> pad to whole interleaver blocks -> nibble
    Hamming(4+cr) -> diagonal interleave -> Gray -> shifts."""
    sf, cr = params.sf, params.cr
    bits = np.unpackbits(np.frombuffer(payload, np.uint8)).astype(np.int64)
    crc = crc16_ccitt(bits)
    crc_bits = (crc >> (15 - np.arange(16))) & 1
    body = np.concatenate([bits, crc_bits])
    body = body ^ whitening_seq(body.size)
    # pad to a whole number of SF-codeword interleaver blocks
    blk_nib = sf                       # nibbles (codewords) per block
    nnib = -(-body.size // 4)
    nblk = -(-nnib // blk_nib)
    pad = nblk * blk_nib * 4 - body.size
    body = np.concatenate([body, np.zeros(pad, np.int64)])
    cw = hamming_encode_nibbles(bits_to_nibbles(body), cr)  # [K, 4+cr]
    shifts = []
    for b in range(nblk):
        sym_bits = diag_interleave(cw[b * sf: (b + 1) * sf], sf)
        w = sym_bits @ (1 << (sf - 1 - np.arange(sf)))      # MSB first
        shifts.append(gray_encode_shift(w))
    return np.concatenate(shifts)


def css_frame_nsym(params: CssParams, payload_len: int) -> int:
    """Symbol count css_encode_frame produces for payload_len bytes."""
    nbits = payload_len * 8 + 16
    nblk = -(-(-(-nbits // 4)) // params.sf)
    return nblk * (4 + params.cr)


def css_decode_frame(params: CssParams, shifts: np.ndarray,
                     payload_len: int):
    """Symbol shifts [S] -> (payload bytes | None, crc_ok). Inverse of
    css_encode_frame for a known payload length."""
    sf, cr = params.sf, params.cr
    nsym_blk = 4 + cr
    shifts = np.asarray(shifts, np.int64)
    nblk = shifts.size // nsym_blk
    cws = []
    for b in range(nblk):
        w = gray_decode_shift(shifts[b * nsym_blk: (b + 1) * nsym_blk])
        sym_bits = ((w[:, None] >> (sf - 1 - np.arange(sf))) & 1)
        cws.append(hamming_decode_nibbles(
            diag_deinterleave(sym_bits, sf), cr))
    body = np.concatenate(cws).reshape(-1)
    nbits = payload_len * 8 + 16
    if body.size < nbits:
        return None, False
    body = body[:nbits] ^ whitening_seq(nbits)
    bits, crc_bits = body[:-16], body[-16:]
    crc_rx = int(crc_bits @ (1 << (15 - np.arange(16))))
    ok = crc16_ccitt(bits) == crc_rx
    payload = np.packbits(bits.astype(np.uint8)).tobytes()
    return (payload if ok else None), ok


# ---------------------------------------------------------------------------
# full link
# ---------------------------------------------------------------------------

def css_transmit(params: CssParams, payload: bytes) -> np.ndarray:
    """Payload -> full burst waveform (preamble + sync + downchirps +
    payload symbols), complex64 chips."""
    return np.concatenate([
        css_preamble(params),
        css_modulate(params, css_encode_frame(params, payload))])


def css_receive(params: CssParams, x: jax.Array, payload_len: int):
    """Burst receiver: sync -> derotate -> demod -> decode.
    Returns (payload bytes | None, crc_ok, CssSync)."""
    sync = css_sync(params, x)
    if not sync.ok:
        return None, False, sync
    nsym = css_frame_nsym(params, payload_len)
    need = sync.start + nsym * params.n
    xx = jnp.asarray(x)
    if need > int(xx.shape[-1]) or sync.start < 0:
        return None, False, sync
    seg = css_derotate(
        params, xx[sync.start: need],
        sync.cfo_bins)
    # derotation is applied from the segment start; the integer CFO is
    # bin-exact regardless, and the fractional part only needs to hold
    # phase across one symbol (argmax is phase-blind)
    shifts, _ = css_demod(params, seg)
    payload, ok = css_decode_frame(params, np.asarray(shifts), payload_len)
    return payload, ok, sync


def css_soft_llrs(params: CssParams, x: jax.Array) -> np.ndarray:
    """Soft outputs: an ALIGNED chip stream [S*N] (css_demod's input)
    -> per-GRAY-DATA-BIT LLRs [S, sf] (positive = bit 0).

    Max-log over the bin hypothesis: every bin k carries the data word
    gray(k) = k ^ (k >> 1), so bit b of the word partitions the bins
    into two halves; LLR_b = max_{k: bit=0} |S_k| - max_{k: bit=1}
    |S_k| (|S_k| is the per-bin matched-filter statistic; at equal
    noise its max-log bit metric is the magnitude difference). One
    mask-select + max pair per bit — plane-op friendly."""
    spec = jnp.abs(jnp.fft.fft(css_frames(params, x), axis=-1))
    mags = np.asarray(spec)                       # [S, N]
    n, sf = params.n, params.sf
    words = gray_decode_shift(np.arange(n))       # data word per bin
    llrs = np.empty((mags.shape[0], sf), np.float32)
    for b in range(sf):
        bit = (words >> (sf - 1 - b)) & 1         # MSB-first, like
        m0 = mags[:, bit == 0].max(axis=1)        # the frame codec
        m1 = mags[:, bit == 1].max(axis=1)
        llrs[:, b] = m0 - m1
    return llrs


def css_decode_frame_soft(params: CssParams, llrs: np.ndarray,
                          payload_len: int):
    """Soft frame decode: per-symbol LLRs [S, sf] -> (payload | None,
    crc_ok). Deinterleaves the LLRs exactly like the hard path, then
    decodes each nibble by EXHAUSTIVE max-correlation against all 16
    codewords of the (4+cr, 4) code — optimal (ML) for the nibble
    codes, worth ~2 dB over hard-decision Hamming at the waterline
    (measured in tests/e2e/test_css_link.py)."""
    sf, cr = params.sf, params.cr
    nsym_blk = 4 + cr
    llrs = np.asarray(llrs, np.float64)
    nblk = llrs.shape[0] // nsym_blk
    # all 16 codewords in +-1 form (+1 = bit 0, matching LLR polarity)
    nibs = np.array([[int(c) for c in f"{v:04b}"] for v in range(16)])
    cws = 1.0 - 2.0 * hamming_encode_nibbles(nibs, cr)      # [16, 4+cr]
    out_bits = []
    for blk in range(nblk):
        sym_llr = llrs[blk * nsym_blk: (blk + 1) * nsym_blk]  # [4+cr,sf]
        cw_llr = np.empty((sf, nsym_blk))
        for c in range(nsym_blk):                 # de-diagonal-interleave
            cw_llr[(np.arange(sf) + c) % sf, c] = sym_llr[c]
        best = np.argmax(cw_llr @ cws.T, axis=1)  # [sf] ML nibble index
        out_bits.append(nibs[best].reshape(-1))
    body = np.concatenate(out_bits)
    nbits = payload_len * 8 + 16
    if body.size < nbits:
        return None, False
    body = body[:nbits] ^ whitening_seq(nbits)
    bits, crc_bits = body[:-16], body[-16:]
    crc_rx = int(crc_bits @ (1 << (15 - np.arange(16))))
    ok = crc16_ccitt(bits) == crc_rx
    payload = np.packbits(bits.astype(np.uint8)).tobytes()
    return (payload if ok else None), ok


_CRC16_MATS: dict = {}


def _crc16_matrix(nbits: int):
    """(M [nbits, 16], c0): crc16_ccitt(b) == c0 XOR packMSB(b @ M % 2)
    — the GF(2)-affine decomposition, built once per message length
    from unit-vector probes through the exact bit-loop CRC."""
    got = _CRC16_MATS.get(nbits)
    if got is not None:
        return got
    c0 = crc16_ccitt(np.zeros(nbits, np.int64))
    m = np.zeros((nbits, 16), np.int64)
    e = np.zeros(nbits, np.int64)
    for i in range(nbits):
        e[:] = 0
        e[i] = 1
        v = crc16_ccitt(e) ^ c0
        m[i] = (v >> (15 - np.arange(16))) & 1
    _CRC16_MATS[nbits] = (m, c0)
    return m, c0


def css_decode_frames_soft_batch(params: CssParams, llrs: np.ndarray,
                                 payload_len: int):
    """Vectorized soft decode of F whole frames at once: llrs
    [F, nsym, sf] -> (payloads [F] list of bytes|None, ok [F] bool).
    Same math as css_decode_frame_soft, restructured so the ML nibble
    correlation is ONE [F, nblk, sf, 4+cr] @ [4+cr, 16] einsum and the
    deinterleave is a precomputed index take — the serving-side decode
    for the on-chip LLR tier (bench/css_modem_onchip.py measured the
    per-frame Python loop ~1000x slower than the demod)."""
    sf, cr = params.sf, params.cr
    nsym_blk = 4 + cr
    llrs = np.asarray(llrs, np.float64)
    f_, nsym, _ = llrs.shape
    nblk = nsym // nsym_blk
    nibs = np.array([[int(c) for c in f"{v:04b}"] for v in range(16)])
    cws = 1.0 - 2.0 * hamming_encode_nibbles(nibs, cr)    # [16, 4+cr]
    blk = llrs[:, : nblk * nsym_blk].reshape(f_, nblk, nsym_blk, sf)
    # deinterleave: the interleaver wrote sym_bits[c][i] into
    # cw[(i + c) % sf][c], so cw_llr[r, c] = blk[c][(r - c) % sf]
    r = np.arange(sf)[:, None]
    c = np.arange(nsym_blk)[None, :]
    cw_llr = blk[:, :, c, (r - c) % sf]                   # [F,nblk,sf,4+cr]
    corr = cw_llr @ cws.T                                  # [F,nblk,sf,16]
    best = np.argmax(corr, axis=-1)
    bits = nibs[best].reshape(f_, -1)                      # [F, nblk*sf*4]
    nbits = payload_len * 8 + 16
    wh = whitening_seq(nbits)
    pw = 1 << (15 - np.arange(16))
    body = bits[:, :nbits] ^ wh[None, :]
    pb, crc_bits = body[:, :-16], body[:, -16:]
    # batched CRC as ONE numpy GF(2) matmul: the CRC is affine in the
    # message (crc(b) = c0 XOR pack(b @ M % 2)), with the influence
    # matrix built once per length from unit-vector probes through the
    # exact crc16_ccitt. (A per-frame gf2 loop measured ~15 ms/frame
    # through the tunnel; even the batched jnp CRC cost ~15 ms of
    # dispatch per call.)
    m, c0 = _crc16_matrix(nbits - 16)
    crcs = np.bitwise_xor.reduce(
        ((pb @ m) % 2) * (1 << (15 - np.arange(16))), axis=1) ^ c0
    oks = crcs == (crc_bits @ pw)
    payloads = [np.packbits(pb[i].astype(np.uint8)).tobytes()
                if oks[i] else None for i in range(f_)]
    return payloads, oks


def css_receive_stream(params: CssParams, x, payload_len: int,
                       max_bursts: int = 64):
    """Multi-burst receiver: scan a stream for preambles, decode each
    frame, continue past it. Returns a list of (payload bytes, crc_ok,
    start chip index) — one entry per detected burst (payload is None
    when the CRC fails). The same host-control/device-compute split as
    the AIS/ADS-B multi-frame receivers."""
    x = np.asarray(x)
    nsym = css_frame_nsym(params, payload_len)
    out = []
    off = 0
    while len(out) < max_bursts and x.size - off >= preamble_len(params):
        payload, ok, sync = css_receive(params, x[off:], payload_len)
        if not sync.ok:
            break
        out.append((payload, ok, off + sync.start))
        # advance past this burst (or at least past its preamble, so a
        # CRC-failed frame cannot stall the scan)
        adv = sync.start + (nsym * params.n if ok else 0)
        off += max(adv, params.n)
    return out


__all__ = [
    "CssParams", "make_css_params", "base_upchirp", "chirp_symbol",
    "css_modulate", "css_frames", "css_demod", "css_demod_frames",
    "CssSync", "css_preamble", "preamble_len", "css_sync",
    "css_derotate",
    "hamming_encode_nibbles", "hamming_decode_nibbles",
    "bits_to_nibbles", "gray_encode_shift", "gray_decode_shift",
    "diag_interleave", "diag_deinterleave", "whitening_seq",
    "crc16_ccitt",
    "css_encode_frame", "css_decode_frame", "css_frame_nsym",
    "css_soft_llrs", "css_decode_frame_soft",
    "css_decode_frames_soft_batch",
    "css_transmit", "css_receive", "css_receive_stream",
]
