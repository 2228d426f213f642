"""On-chip coded CSS modem: the X65 serving story end-to-end — raw
symbol frames -> folded dechirp-DFT matmul -> per-Gray-bit max-log
LLRs ON-CHIP (`make_css_llr_planes`), then the exhaustive-ML soft
nibble decode on the host. Gates: every frame's decoded payload == tx
at the design SNR (from the CHIP's LLRs), before any timing.

    python bench/css_modem_onchip.py [--sf 8] [--frames 1024]
                                     [--snr-db -11] [--bf16]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=int, default=8)
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--snr-db", type=float, default=-11.0)
    ap.add_argument("--plen", type=int, default=20)
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from srcdsp_tpu.chains import css
    from srcdsp_tpu.chains.css_planes import make_css_llr_planes

    rng = np.random.default_rng(0)
    p = css.make_css_params(sf=args.sf, cr=4)
    nsym = css.css_frame_nsym(p, args.plen)
    payloads = [bytes(rng.integers(0, 256, args.plen, dtype=np.uint8))
                for _ in range(args.frames)]
    shifts = np.concatenate([css.css_encode_frame(p, pl)
                             for pl in payloads])
    tx = css.css_modulate(p, shifts)
    sigma = np.sqrt(10 ** (-args.snr_db / 10) / 2)
    x = (tx + sigma * (rng.standard_normal(tx.size)
                       + 1j * rng.standard_normal(tx.size))
         ).astype(np.complex64)
    fr = x.reshape(-1, p.n)
    xr = np.ascontiguousarray(fr.real).astype(np.float32)
    xi = np.ascontiguousarray(fr.imag).astype(np.float32)

    prec = (jax.lax.Precision.DEFAULT if args.bf16
            else jax.lax.Precision.HIGHEST)
    fn = jax.jit(make_css_llr_planes(p, precision=prec))
    tpu = jax.devices()[0]
    args_t = (jax.device_put(jnp.asarray(xr), tpu),
              jax.device_put(jnp.asarray(xi), tpu))
    llrs = np.asarray(fn(*args_t))

    # correctness gate: every frame decodes to its payload from the
    # CHIP's LLRs (vectorized batch decode — the per-frame Python loop
    # measured ~1000x slower than the demod)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):        # gf2 CRC stays off the tunnel
        outs, oks = css.css_decode_frames_soft_batch(
            p, llrs.reshape(args.frames, nsym, p.sf), args.plen)
        t0 = time.perf_counter()         # time the WARM decode
        outs, oks = css.css_decode_frames_soft_batch(
            p, llrs.reshape(args.frames, nsym, p.sf), args.plen)
        host_s = time.perf_counter() - t0
    n_ok = sum(bool(o and out == pl) for o, out, pl
               in zip(oks, outs, payloads))

    def region(k):
        t0 = time.perf_counter()
        y = None
        for _ in range(k):
            y = fn(*args_t)
        np.asarray(y[:1, :1])
        return time.perf_counter() - t0

    from slope import calibrated_slope
    sec, _k = calibrated_slope(region, trials=5)
    chips = fr.shape[0] * p.n
    coded_bits = fr.shape[0] * p.sf
    info_bits = args.frames * args.plen * 8
    print(json.dumps({
        "probe": "css_modem_onchip", "sf": args.sf, "cr": 4,
        "frames": args.frames, "payload_bytes": args.plen,
        "snr_db": args.snr_db, "bf16": args.bf16,
        "frames_decoded_ok": n_ok, "all_ok": n_ok == args.frames,
        "chips_per_call": chips,
        "demod_msps": round(chips / sec / 1e6, 1) if sec else None,
        "coded_mbps": round(coded_bits / sec / 1e6, 1) if sec else None,
        "info_mbps_demod_limited": (round(info_bits / sec / 1e6, 1)
                                    if sec else None),
        "host_decode_mbps": round(info_bits / host_s / 1e6, 2),
        "backend": jax.default_backend(),
    }), flush=True)


if __name__ == "__main__":
    main()
