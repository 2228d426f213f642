"""End-to-end CODED LINK on-chip: fused FSK demod -> Pallas LDPC decode.

Round 2's gap was a decoder-bound coded link (19 Gs/s demod vs 7.5 Mb/s
decode). This bench runs the whole receive path on the chip in one
jitted pipeline per stage:

    capture [C, 2, HX+N] --(fsk_fused kernel: mix+FIR+decim+disc+timing)
      --> soft symbols [C, Nsym] --(llr = -soft; normalized min-sum is
      scale-invariant in its decisions, so no noise-variance estimate is
      needed)--> Pallas edge-form LDPC decode --> info bits + CRC-style
      ok flags

and reports aggregate input Ms/s, coded Mb/s through the decoder, and
end-to-end info BER on an AWGN fixture. The demod group delay is
resolved once on the hard bits (lag search over +-2 symbols), exactly
like the chain tests.

    python bench/coded_link_onchip.py [--channels 4] [--words 256]
        [--snr-db 14] [--platform cpu]   # cpu = small interpret dry-run
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=4)
    ap.add_argument("--words", type=int, default=256,
                    help="LDPC codewords per channel (n=504 each)")
    ap.add_argument("--iters", type=int, default=10, help="decode iters")
    ap.add_argument("--snr-db", type=float, default=14.0, dest="snr_db")
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from srcdsp_tpu.kernels.fsk_fused import (fsk_demod_fused,
                                              make_fsk_mc_kernel)
    from srcdsp_tpu.kernels.ldpc_pallas import make_ldpc_decoder, plan_edges
    from srcdsp_tpu.ldpc import ldpc_encode, make_ldpc_code, \
        make_regular_ldpc
    from srcdsp_tpu.ops.nco import freq_to_word
    from srcdsp_tpu.ops.window import lowpass
    from srcdsp_tpu.testing.signals import fsk_baseband, tone

    on_cpu = args.platform == "cpu"
    cch, decim, sps = args.channels, 4, 8
    out_tile, b_rows = (128, 2) if on_cpu else (512, 32)
    blk_sym = b_rows * out_tile // sps       # symbols per grid block
    ncode = 504
    h = make_regular_ldpc(ncode, 3, 6, seed=0)
    with jax.default_device(jax.devices("cpu")[0]):
        code_cpu = make_ldpc_code(h)         # encode runs on CPU (fixture)
    code = jax.device_put(code_cpu, jax.devices()[0])
    plan = plan_edges(h)

    # symbols = codeword bits + a small tail margin (covers the demod
    # group-delay lag), rounded UP to whole grid blocks; tail is zeros
    nw = args.words
    nsym = -(-(nw * ncode + 8) // blk_sym) * blk_sym

    rng = np.random.default_rng(0)
    u = rng.integers(0, 2, (cch, nw, code.k))
    taps = lowpass(64, 0.03)
    centers = [0.05 + 0.01 * c for c in range(cch)]
    words = np.asarray([freq_to_word(-c) for c in centers], np.uint32)
    # fixture generation is complex-dtype work — pin it to the CPU
    # backend (the axon chip has no complex64)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        cw = np.asarray(ldpc_encode(code_cpu, jnp.asarray(u.reshape(-1, code.k))))
        bits_tx = cw.reshape(cch, nw * ncode)
        bits_pad = np.concatenate(
            [bits_tx, np.zeros((cch, nsym - nw * ncode), np.int64)], axis=-1)
        bb = fsk_baseband(jnp.asarray(bits_pad), decim * sps, 0.05 / decim)
        x = np.stack([np.asarray(bb[c] * tone(bb.shape[-1], centers[c]))
                      for c in range(cch)])
    sigma = float(10.0 ** (-args.snr_db / 20.0)) / np.sqrt(2.0)
    x = x + sigma * (rng.standard_normal(x.shape)
                     + 1j * rng.standard_normal(x.shape))

    fn, hist = make_fsk_mc_kernel(taps, decim, cch, sps, out_tile=out_tile,
                                  b_rows=b_rows, class_major=not on_cpu,
                                  interpret=on_cpu)
    n = nsym * decim * sps
    planes = np.zeros((cch, 2, hist + n), np.float32)
    planes[:, 0, hist:] = x[:, :n].real
    planes[:, 1, hist:] = x[:, :n].imag
    planes = jax.device_put(jnp.asarray(planes))
    words0 = np.asarray([(-hist * int(w)) % (1 << 32) for w in words],
                        np.uint32)

    demod = jax.jit(lambda p: fsk_demod_fused(
        fn, hist, out_tile, words0, words, p, sps,
        class_major=not on_cpu)[1])
    dec = make_ldpc_decoder(code, plan, iters=args.iters,
                            interpret=on_cpu)

    # one reference pass: resolve the constant demod group delay on the
    # hard bits, then fix the lag for the timed pipeline
    bits_rx, soft = demod(planes)
    br = np.asarray(bits_rx)
    best_lag, best_ber = 0, 1.0
    for lag in range(0, 3):
        nn = nw * ncode - lag
        ber = float((br[:, lag:lag + nn] != bits_tx[:, :nn]).mean())
        if ber < best_ber:
            best_lag, best_ber = lag, ber
    lag = best_lag

    def pipeline(p):
        _, soft = demod(p)
        s = jax.lax.slice_in_dim(soft, lag, lag + nw * ncode, axis=-1)
        llr = -s.reshape(cch * nw, ncode)
        return dec(llr)

    bits_d, info, ok = pipeline(planes)
    ok_np = np.asarray(ok).reshape(cch, nw)
    info_np = np.asarray(info).reshape(cch, nw, code.k)
    ber_info = float((info_np != u).mean())
    result = {
        "metric": f"coded_link_fsk_ldpc_{cch}ch_n{ncode}",
        "channels": cch, "codewords": int(cch * nw),
        "raw_ber": best_ber, "info_ber": ber_info,
        "ok_fraction": float(ok_np.mean()),
        "snr_db": args.snr_db,
        "backend": jax.devices()[0].platform,
    }
    if on_cpu:
        print(json.dumps(result))
        return

    def region(k):
        t0 = time.perf_counter()
        for _ in range(k):
            r = pipeline(planes)
        np.asarray(r[1][:1, :1])
        return time.perf_counter() - t0

    region(1)
    # calibrated region (polar_onchip pattern): the per-call time here is
    # ~1.5-2 ms, so 2-call regions sit inside the sync jitter — size the
    # region from a differenced burst estimate instead
    est = max((region(16) - region(8)) / 8.0, 1e-5)
    kreg = int(min(192, max(4, __import__("numpy").ceil(0.08 / est))))
    slopes = []
    for _ in range(args.trials):
        t1 = region(kreg)
        t2 = region(2 * kreg)
        slopes.append((t2 - t1) / kreg)
    med = float(np.median(slopes))
    result.update({
        "ms_per_call": med * 1e3,
        "agg_msamples_per_s": cch * n / med / 1e6,
        "coded_mbit_per_s": cch * nw * ncode / med / 1e6,
    })
    print(json.dumps(result))


if __name__ == "__main__":
    main()
