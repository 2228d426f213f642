"""Serving-speed coherent coded modem on-chip: QAM front end -> exact
max-log plane demap -> QC layered LDPC, one jitted pipeline.

Round-4 verdict item 1: the 7.44 Gb/s QC decoder was consumed by no
chain — the only coded link (bench/coded_link_onchip.py) is FSK-demod-
rate-bound at 243 Mb/s (32 samples per coded bit). This modem feeds the
decoder at its own rate: QAM16 at 2 samples/symbol = 0.5 samples per
coded bit, a 64x better demod:decode ratio.

    capture [C, 2, hist+N]
      --(mixfir MC kernel: mix + RRC matched filter + decimate-to-
         symbol-rate)--> symbol planes
      --(qam_llr_planes: exact per-axis max-log)--> LLRs [C*nw, 1536]
      --(QC layered kernel, z=128 4x12 dual-diagonal rate-2/3)-->
         bits / ok

Gates before timing: every syndrome clean AND decoded codewords
IDENTICAL to the transmitted ones (the truth is known — stronger than a
CPU-twin comparison). Timing is calibrated-slope (bench/slope.py).

    python bench/modem_onchip.py [--channels 8] [--words 512]
        [--iters 6] [--snr-db 13] [--order 16] [--platform cpu]
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


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=8)
    ap.add_argument("--words", type=int, default=512,
                    help="LDPC codewords per channel (n=1536 each)")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--snr-db", type=float, default=13.0, dest="snr_db")
    ap.add_argument("--order", type=int, default=16)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from srcdsp_tpu.chains.modem import (make_coherent_modem,
                                         map_codewords_to_symbols)
    from srcdsp_tpu.chains.tx import (linear_tx_apply, linear_tx_init,
                                      make_linear_tx, qam_map)
    from srcdsp_tpu.kernels.ldpc_pallas import plan_qc
    from srcdsp_tpu.ops.nco import freq_to_word
    from srcdsp_tpu.ops.window import root_raised_cosine
    from srcdsp_tpu.qcldpc import (make_dual_diagonal_base, make_qc_ldpc,
                                   qc_encode_dual_diagonal)

    on_cpu = args.platform == "cpu"
    C, nw, order, sps = args.channels, args.words, args.order, 2
    if on_cpu:
        nw = min(nw, 4)
        z, mb, nb = 16, 4, 12
        out_tile, b_rows, iters = 128, 2, 4
    else:
        z, mb, nb = 128, 4, 12
        out_tile, b_rows, iters = 512, 32, args.iters
    base = make_dual_diagonal_base(mb, nb, z, seed=0)
    code = make_qc_ldpc(base, z)
    plan = plan_qc(base, z)
    n, k = nb * z, (nb - mb) * z
    bps = int(order).bit_length() - 1
    spc = n // bps

    cpu = jax.devices("cpu")[0]
    rng = np.random.default_rng(0)
    u = rng.integers(0, 2, (C * nw, k))
    taps = root_raised_cosine(sps, 16, beta=0.35)     # len 33
    centers = [0.05 + 0.03 * c for c in range(C)]
    blk = b_rows * out_tile
    nsym_pad = -(-(nw * spc + len(taps)) // blk) * blk

    with jax.default_device(cpu):
        cw = np.asarray(qc_encode_dual_diagonal(base, z, jnp.asarray(u)))
        idx = np.asarray(map_codewords_to_symbols(
            jnp.asarray(cw), order)).reshape(C, nw * spc)
        sym = np.asarray(qam_map(jnp.asarray(idx), order))

        def tx(s, c):
            params = make_linear_tx(c, taps, sps)
            st = linear_tx_init(params)
            _, xv = jax.jit(lambda st_, v: linear_tx_apply(
                params, st_, v))(st, jnp.asarray(s))
            return np.asarray(xv)

        pad = np.zeros(nsym_pad - nw * spc, np.complex64)
        x = np.stack([tx(np.concatenate([sym[c], pad]), centers[c])
                      for c in range(C)])
        imp = np.zeros(64, np.complex64)
        imp[0] = 1.0
        cas = np.convolve(tx(imp, 0.0).real, taps)
    g = float(cas.max())
    lag_samp = int(cas.argmax())
    assert lag_samp % sps == 0, "cascade delay must be whole symbols"

    sigma = 10.0 ** (-args.snr_db / 20.0) / np.sqrt(2.0)
    x = x + sigma * (rng.standard_normal(x.shape)
                     + 1j * rng.standard_normal(x.shape))

    dwords = np.asarray([freq_to_word(-c) for c in centers], np.uint32)
    pipeline, hist = make_coherent_modem(
        taps / g, dwords, sps, order, code, plan, nw=nw,
        lag=lag_samp // sps, iters=iters, out_tile=out_tile,
        b_rows=b_rows, b_tile=(C * nw if on_cpu else 128),
        interpret=on_cpu)
    n_in = nsym_pad * sps
    planes = np.zeros((C, 2, hist + n_in), np.float32)
    planes[:, 0, hist:] = x.real
    planes[:, 1, hist:] = x.imag
    planes = jax.device_put(jnp.asarray(planes))
    run = jax.jit(pipeline)

    bits_t, ok = run(planes)
    bits_np = np.asarray(bits_t).T
    ok_frac = float(np.asarray(ok).mean())
    ber_coded = float((bits_np != cw).mean())
    exact = bool(np.array_equal(bits_np, cw))
    result = {
        "metric": f"modem_qam{order}_qcldpc_n{n}_{C}ch",
        "channels": C, "codewords": C * nw,
        "ok_fraction": ok_frac, "coded_ber": ber_coded,
        "decoded_equals_tx": exact, "snr_db": args.snr_db,
        "iters": iters, "backend": jax.devices()[0].platform,
    }
    if not exact:
        result["status"] = "GATE_FAILED"
        print(json.dumps(result))
        return
    if on_cpu:
        print(json.dumps(result))
        return

    def region(kcalls):
        t0 = time.perf_counter()
        for _ in range(kcalls):
            r = run(planes)
        np.asarray(r[0][:1, :1])
        return time.perf_counter() - t0

    region(1)
    from slope import calibrated_slope
    med, kk = calibrated_slope(region, trials=args.trials)
    if med is None:
        result["status"] = "measurement_unresolved"
        result["kk"] = kk
        print(json.dumps(result))
        return
    result.update({
        "kk": kk,
        "ms_per_call": med * 1e3,
        "agg_msamples_per_s": C * n_in / med / 1e6,
        "coded_mbit_per_s": C * nw * n / med / 1e6,
        "info_mbit_per_s": C * nw * k / med / 1e6,
    })
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
