"""On-chip polar SC decode throughput (restricted axon backend).

The trace-unrolled SC recursion (srcdsp_tpu/polar.py) is pure static
jnp — elementwise f/g updates, static slices, XOR partial sums — so
vmapped batches lower on the axon on-chip subset directly. Measured
2026-08-19: the decode is dispatch-bound through B=2048 (~27 ms/batch
flat), so batching is free throughput: B=64 0.59 Mb/s -> B=2048
19.8 Mb/s coded.

    python bench/polar_onchip.py [--n 256] [--k 128] [--batch 4096]
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
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--k", type=int, default=128)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--snr-db", type=float, default=3.0, dest="snr_db")
    ap.add_argument("--scl", type=int, default=0, metavar="L",
                    help="use SC-LIST decoding with list size L (the "
                         "production decoder; traced argsort + gathers — "
                         "supported on-chip per the 2026-08-19 re-probe)")
    ap.add_argument("--fast", action="store_true",
                    help="rate-0/REP subtree shortcuts (bit-identical)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from srcdsp_tpu.polar import make_polar, polar_decode, polar_encode

    code = make_polar(args.n, args.k)
    rng = np.random.default_rng(0)
    u = rng.integers(0, 2, (args.batch, code.k))
    cw = np.asarray(polar_encode(code, jnp.asarray(u)))
    sigma = float(10.0 ** (-args.snr_db / 20.0))
    y = (1.0 - 2.0 * cw) + sigma * rng.standard_normal(cw.shape)
    llr = jnp.asarray(2.0 / sigma ** 2 * y, jnp.float32)

    from srcdsp_tpu.polar import polar_decode_list_onehot
    if args.scl:
        # one-hot SCL (round 3): bit-identical to the gather form, 6.4x
        # faster on-chip (31.8 vs 5.0 Mb/s at L=8/B=1024)
        one = lambda l: polar_decode_list_onehot(
            code, l, list_size=args.scl, fast=args.fast)[0][0]
        tag = f"scl{args.scl}" + ("_fast" if args.fast else "")
    else:
        one = lambda l: polar_decode(code, l)[0]
        tag = "sc"
    dec = jax.jit(jax.vmap(one))
    try:
        info = dec(llr)
        np.asarray(info[:1, :1])
    except Exception as e:
        print(json.dumps({
            "metric": f"polar_n{args.n}_k{args.k}_b{args.batch}_{tag}_decode",
            "backend": jax.devices()[0].platform,
            "blocked_by": str(e)[:200],
        }))
        return
    ber = float((np.asarray(info) != u).mean())
    # cross-check vs the CPU run of the same static graph
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        i2 = jax.jit(jax.vmap(one))(jax.device_put(llr, cpu))
    match = bool(np.array_equal(np.asarray(info), np.asarray(i2)))

    # slope timing (bench/run.py:_force: block_until_ready no longer
    # drains the tunnel queue; fixed sync cancels in the difference)
    def region(k):
        t0 = time.perf_counter()
        for _ in range(k):
            r = dec(llr)
        np.asarray(r[:1, :1])
        return time.perf_counter() - t0

    # region length: the difference must dominate the +-5-30 ms sync
    # jitter. SCL calls are ~8 ms so kk=3 suffices; plain SC at large
    # batch is ~0.1 ms/call and short regions produced NEGATIVE or
    # inflated slopes (observed 2026-08-20) — the region must be
    # hundreds of calls for a >=25 ms difference signal.
    kk = 3 if args.scl else 96
    slopes = []
    for _ in range(args.trials):
        t1 = region(kk)
        t2 = region(2 * kk)
        slopes.append((t2 - t1) / kk)
    med = float(np.median(slopes))
    print(json.dumps({
        "metric": f"polar_n{args.n}_k{args.k}_b{args.batch}_{tag}_decode",
        "coded_bits_per_s": args.batch * code.n / med,
        "ms_per_codeword": med * 1e3 / args.batch,
        "batch": args.batch, "info_ber": ber, "matches_cpu": match,
        "backend": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
