"""On-chip turbo (max-log BCJR) decode throughput (axon backend).

The BCJR forward/backward recursions are `lax.scan`s over static gather
tables and the interleaver is a static `jnp.take` — all of which the
axon backend now supports (2026-08-19 re-probe: 512-step 2-D scans,
traced-index gathers, argsort all lower; the round-1 "no scan, no
gather" matrix is stale). Per-codeword arrays are 1-D (unsupported), so
the probe vmaps a batch — every op then carries a lane dimension.

    python bench/turbo_onchip.py [--t 512] [--iters 4] [--batch 256]

Cross-checks decisions bit-for-bit against the same jitted graph on the
CPU backend and reports coded-bit throughput from slope timing
(bench/run.py:_force note — block_until_ready no longer drains).
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
    ap.add_argument("--t", type=int, default=512, help="info block length")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--snr-db", type=float, default=1.5, dest="snr_db")
    ap.add_argument("--layout", choices=["vmap", "batch", "pallas"],
                    default="vmap",
                    help="batch = lane-native [T, B] BCJR "
                         "(turbo_decode_batch; bit-identical decisions); "
                         "pallas = VMEM-resident BCJR kernels "
                         "(kernels/bcjr_pallas.py, bit-identical to batch)")
    ap.add_argument("--b-tile", type=int, default=128, dest="b_tile",
                    help="pallas layout: lanes per kernel tile")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from srcdsp_tpu.turbo import (make_turbo, turbo_decode,
                                  turbo_decode_batch, turbo_encode)

    tc = make_turbo(args.t, seed=0)
    rng = np.random.default_rng(0)
    u = rng.integers(0, 2, (args.batch, args.t))
    sys_b, par1, par2 = jax.vmap(lambda b: turbo_encode(tc, b))(
        jnp.asarray(u))
    n_coded = sys_b.shape[-1] + par1.shape[-1] + par2.shape[-1]
    sigma = float(10.0 ** (-args.snr_db / 20.0))

    def ch(bits):
        return jnp.asarray(
            2.0 / sigma ** 2 * ((1.0 - 2.0 * np.asarray(bits))
                                + sigma * rng.standard_normal(bits.shape)),
            jnp.float32)

    ls, lp1, lp2 = ch(sys_b), ch(par1), ch(par2)

    if args.layout == "batch":
        dec = jax.jit(lambda a, b, c: turbo_decode_batch(
            tc, a, b, c, iters=args.iters))
    elif args.layout == "pallas":
        from srcdsp_tpu.kernels.bcjr_pallas import turbo_decode_pallas
        interp = jax.devices()[0].platform == "cpu"
        dec = jax.jit(lambda a, b, c: turbo_decode_pallas(
            tc, a, b, c, iters=args.iters,
            b_tile=min(args.b_tile, args.batch), interpret=interp))
    else:
        dec = jax.jit(jax.vmap(
            lambda a, b, c: turbo_decode(tc, a, b, c, iters=args.iters)))
    try:
        bits, post = dec(ls, lp1, lp2)
        np.asarray(bits[:1, :1])
    except Exception as e:
        print(json.dumps({
            "metric": f"turbo_t{args.t}_it{args.iters}_b{args.batch}"
                      f"_{args.layout}_decode",
            "backend": jax.devices()[0].platform,
            "blocked_by": str(e)[:200],
        }))
        return
    ber = float((np.asarray(bits) != u).mean())

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        b2, _ = jax.jit(jax.vmap(
            lambda a, b, c: turbo_decode(tc, a, b, c, iters=args.iters)))(
            *(jax.device_put(a, cpu) for a in (ls, lp1, lp2)))
    match = bool(np.array_equal(np.asarray(bits), np.asarray(b2)))

    def region(k):
        t0 = time.perf_counter()
        for _ in range(k):
            r = dec(ls, lp1, lp2)
        np.asarray(r[0][:1, :1])
        return time.perf_counter() - t0

    from slope import calibrated_slope
    med, k = calibrated_slope(region, trials=args.trials)
    if med is None:
        print(json.dumps({
            "metric": f"turbo_t{args.t}_it{args.iters}_b{args.batch}"
                      f"_{args.layout}_decode",
            "status": "measurement_unresolved", "kk": k,
            "matches_cpu": match, "backend": jax.default_backend()}))
        return
    print(json.dumps({
        "metric": f"turbo_t{args.t}_it{args.iters}_b{args.batch}"
                  f"_{args.layout}_decode",
        "coded_bits_per_s": args.batch * n_coded / med,
        "info_bits_per_s": args.batch * args.t / med,
        "ms_per_codeword": med * 1e3 / args.batch,
        "batch": args.batch, "info_ber": ber, "matches_cpu": match,
        "backend": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
