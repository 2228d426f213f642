"""Coded-OFDM modem on-chip: OFDM plane front end -> bit-plane BICM
demap -> column-major QC layered LDPC, one jitted pipeline (the
multicarrier sibling of bench/modem_onchip.py, same gates).

Gates before timing: every syndrome clean AND decoded codewords
IDENTICAL to the transmitted ones. Timing is calibrated-slope.

    python bench/ofdm_modem_onchip.py [--channels 8] [--words 512]
        [--iters 6] [--snr-db 15] [--order 16] [--platform cpu]
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
    ap.add_argument("--words", type=int, default=512)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--snr-db", type=float, default=15.0, dest="snr_db")
    ap.add_argument("--order", type=int, default=16)
    ap.add_argument("--pilots", type=int, default=1)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from srcdsp_tpu.chains.modem import map_codewords_to_symbols
    from srcdsp_tpu.chains.ofdm import make_ofdm_spec, ofdm_modulate, sym_len
    from srcdsp_tpu.chains.ofdm_modem import make_ofdm_coded_modem
    from srcdsp_tpu.chains.qam import qam_constellation
    from srcdsp_tpu.kernels.ldpc_pallas import plan_qc
    from srcdsp_tpu.qcldpc import (make_dual_diagonal_base, make_qc_ldpc,
                                   qc_encode_dual_diagonal)

    on_cpu = args.platform == "cpu"
    C, nw, order = args.channels, args.words, args.order
    if on_cpu:
        nw = min(nw, 4)
        z, mb, nb, iters = 16, 4, 12, 4
    else:
        z, mb, nb, iters = 128, 4, 12, args.iters
    base = make_dual_diagonal_base(mb, nb, z, seed=0)
    code = make_qc_ldpc(base, z)
    plan = plan_qc(base, z)
    n, k = nb * z, (nb - mb) * z
    bps = int(order).bit_length() - 1
    spc = n // bps
    spec = make_ofdm_spec(nfft=64, cp=16, n_active=52, order=order)
    na = spec.active.size

    cpu = jax.devices("cpu")[0]
    rng = np.random.default_rng(0)
    u = rng.integers(0, 2, (C * nw, k))
    with jax.default_device(cpu):
        cw = np.asarray(qc_encode_dual_diagonal(base, z, jnp.asarray(u)))
        idx = np.asarray(map_codewords_to_symbols(
            jnp.asarray(cw), order)).reshape(C, nw * spc)
        pts = np.asarray(qam_constellation(order))
        s_data = -(-(nw * spc) // na)
        fill = rng.integers(0, order, (C, s_data * na - nw * spc))
        grid = pts[np.concatenate([idx, fill], axis=1)].reshape(
            C, s_data, na)
        pilot = pts[rng.integers(0, order, na)]
        y = []
        for ch in range(C):
            points = np.concatenate(
                [np.tile(pilot[None], (args.pilots, 1)), grid[ch]],
                axis=0)
            tx = np.asarray(ofdm_modulate(spec, jnp.asarray(points)))
            hch = np.array([1.0, 0.2 * np.exp(1j * 0.5)])
            rx = np.convolve(tx, hch)[: tx.size]
            y.append(rx.astype(np.complex64))
        y = np.stack(y)
    sigma = 10.0 ** (-args.snr_db / 20.0) / np.sqrt(2.0)
    y = y + sigma * (rng.standard_normal(y.shape)
                     + 1j * rng.standard_normal(y.shape))
    kk = (y.shape[-1] // sym_len(spec)) * sym_len(spec)
    yr = jnp.asarray(np.ascontiguousarray(y.real[:, :kk]).astype(np.float32))
    yi = jnp.asarray(np.ascontiguousarray(y.imag[:, :kk]).astype(np.float32))
    pr = jnp.asarray(pilot.real.astype(np.float32))
    pi_ = jnp.asarray(pilot.imag.astype(np.float32))

    pipeline = jax.jit(make_ofdm_coded_modem(
        spec, code, plan, num_channels=C, nw=nw, iters=iters,
        b_tile=(C * nw if on_cpu else 128), n_pilot=args.pilots,
        interpret=on_cpu))
    bits_t, ok = pipeline(yr, yi, pr, pi_)
    bits = np.asarray(bits_t).T
    ok = np.asarray(ok)
    ber = float(np.mean(bits != cw))
    match = bool(np.all(bits == cw))
    out = {"metric": f"ofdm_modem_qam{order}_qcldpc_n{n}_{C}ch",
           "channels": C, "codewords": C * nw,
           "ok_fraction": float(ok.mean()), "coded_ber": ber,
           "decoded_equals_tx": match, "snr_db": args.snr_db,
           "iters": iters, "pilots": args.pilots,
           "backend": jax.default_backend()}
    if not (match and ok.all()):
        print(json.dumps(out), flush=True)
        sys.exit(1)
    if on_cpu:
        print(json.dumps(out), flush=True)
        return

    def region(kc):
        t0 = time.perf_counter()
        r = None
        for _ in range(kc):
            r = pipeline(yr, yi, pr, pi_)
        np.asarray(r[0][:1, :1])
        return time.perf_counter() - t0

    from slope import calibrated_slope
    sec, kreg = calibrated_slope(region, trials=args.trials)
    out["kk"] = kreg
    if sec:
        out["ms_per_call"] = sec * 1e3
        out["agg_msamples_per_s"] = C * kk / sec / 1e6
        out["coded_mbit_per_s"] = C * nw * n / sec / 1e6
        out["info_mbit_per_s"] = C * nw * k / sec / 1e6
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
