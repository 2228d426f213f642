"""On-chip LDPC min-sum decode throughput (restricted axon backend).

The equality-based check-node update (ldpc.minsum_c2v) uses only
elementwise/reduce ops, and `ldpc_decode(..., unroll=True)` removes the
lax.scan — the whole decode then lowers on the axon on-chip subset (2-D
f32 elementwise + reductions + matmul). This script measures coded-bit
throughput per chip and cross-checks the decode against the CPU path.

    python bench/ldpc_onchip.py [--n 504] [--iters 10] [--trials 5] [--batch 64]

Batching note (2026-08-19, measured): the [B, M, N] batched message
tensor DOES lower on the axon subset (3-D elementwise + axis=-2 reduce
work on-chip), so a whole batch decodes in ONE dispatch — the original
1-codeword form was pure tunnel round-trip latency (~30 ms/codeword) and
batching amortizes it exactly like the other on-chip chains (BASELINE.md
"Call sizing").
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _qc(args):
    """QC layered Pallas kernel probe (the round-3 1.9 Gb/s measurement,
    now reproducible): dual-diagonal base (802.11n-shaped), O(N) encode,
    make_qc_decoder serving path, decisions vs the CPU layered tier."""
    import jax
    import jax.numpy as jnp

    from srcdsp_tpu.kernels.ldpc_pallas import make_qc_decoder, plan_qc
    from srcdsp_tpu.ldpc import make_ldpc_code
    from srcdsp_tpu.qcldpc import (make_dual_diagonal_base, make_qc_ldpc,
                                   qc_encode_dual_diagonal)

    z, mb, nb = 128, 4, 12
    base = make_dual_diagonal_base(mb, nb, z, seed=0)
    code = make_qc_ldpc(base, z)
    plan = plan_qc(base, z)
    rng = np.random.default_rng(0)
    u = rng.integers(0, 2, (args.batch, code.k))
    cw = np.asarray(qc_encode_dual_diagonal(base, z, jnp.asarray(u)))
    sigma = 0.5
    y = (1.0 - 2.0 * cw) + sigma * rng.standard_normal(cw.shape)
    llr = jnp.asarray(2.0 / sigma ** 2 * y, jnp.float32)

    interp = jax.devices()[0].platform == "cpu"
    dec = make_qc_decoder(code, plan, iters=args.qc_iters,
                          b_tile=args.b_tile, interpret=interp)
    bits, info, ok = dec(llr)
    np.asarray(bits[:1, :1])
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        from srcdsp_tpu.qcldpc import ldpc_decode_layered
        b2, _, ok2 = jax.jit(lambda l: ldpc_decode_layered(
            code, l, plan.z, iters=args.qc_iters))(
                jax.device_put(llr, cpu))
    match = bool(np.array_equal(np.asarray(bits), np.asarray(b2)))

    def region(k):
        t0 = time.perf_counter()
        for _ in range(k):
            r = dec(llr)
        np.asarray(r[0][:1, :1])
        return time.perf_counter() - t0

    from slope import calibrated_slope
    med, kk = calibrated_slope(region, trials=args.trials)
    if med is None:
        print(json.dumps({
            "metric": f"qcldpc_z{z}_{mb}x{nb}_it{args.qc_iters}"
                      f"_b{args.batch}_pallas_decode",
            "status": "measurement_unresolved", "kk": kk,
            "decisions_match_cpu_layered": match,
            "backend": jax.default_backend()}))
        return
    print(json.dumps({
        "metric": f"qcldpc_z{z}_{mb}x{nb}_it{args.qc_iters}"
                  f"_b{args.batch}_pallas_decode",
        "kk": kk,
        "coded_bits_per_s": args.batch * code.n / med,
        "ms_per_codeword": med * 1e3 / args.batch,
        "batch": args.batch, "ok": bool(np.asarray(ok).all()),
        "decisions_match_cpu_layered": match,
        "backend": jax.default_backend(),
    }), flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=504)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--batch", type=int, default=64,
                    help="codewords per dispatch (1 = latency probe)")
    ap.add_argument("--kernel", action="store_true",
                    help="use the Pallas edge-form kernel "
                         "(kernels/ldpc_pallas.py) instead of the XLA "
                         "dense path; cross-checks BIT-FOR-BIT vs the "
                         "jnp reference tier on CPU")
    ap.add_argument("--b-tile", type=int, default=128,
                    help="kernel batch tile (codewords per grid step)")
    ap.add_argument("--qc", action="store_true",
                    help="use the QC LAYERED Pallas kernel on a "
                         "dual-diagonal standards-shaped code (z=128, "
                         "4x12 base, rate 2/3) instead of the (3,6) "
                         "regular edge kernel; decisions cross-checked "
                         "vs the jnp layered reference on CPU")
    ap.add_argument("--qc-iters", type=int, default=6)
    ap.add_argument("--platform", default=None,
                    help="override backend (e.g. cpu for a dry run)")
    args = ap.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from srcdsp_tpu.ldpc import ldpc_decode, ldpc_encode, make_ldpc_code, \
        make_regular_ldpc

    if args.qc:
        _qc(args)
        return

    h = make_regular_ldpc(args.n, 3, 6, seed=0)
    code = make_ldpc_code(h)
    rng = np.random.default_rng(0)
    u = rng.integers(0, 2, (args.batch, code.k))
    cw = np.asarray(ldpc_encode(code, jnp.asarray(u)))
    sigma = 0.55
    y = (1.0 - 2.0 * cw) + sigma * rng.standard_normal(cw.shape)
    llr = jnp.asarray(2.0 / sigma ** 2 * y, jnp.float32)

    if args.kernel:
        from srcdsp_tpu.kernels.ldpc_pallas import (
            ldpc_decode_edges_ref, make_ldpc_decoder, plan_edges)
        plan = plan_edges(h)
        interp = jax.devices()[0].platform == "cpu"   # CPU dry runs
        # NOTE: make_ldpc_decoder is internally jitted with the code
        # arrays as ARGUMENTS — wrapping it in another jax.jit would
        # re-embed them as closure constants, which the tunnel backend
        # re-ships every call (26 ms fixed; BASELINE.md round-3 notes)
        dec = make_ldpc_decoder(code, plan, iters=args.iters,
                                b_tile=args.b_tile, interpret=interp)
        bits, info, ok = dec(llr)
        bits.block_until_ready()
        # bit-for-bit cross-check: hardware kernel posterior decisions vs
        # the jnp reference tier jitted on CPU (quantized min-sum is the
        # same arithmetic on both — see ldpc_pallas docstring)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            post_ref = jax.jit(lambda l: ldpc_decode_edges_ref(
                plan, l, iters=args.iters))(jax.device_put(llr.T, cpu))
            b2 = (np.asarray(post_ref).T < 0).astype(np.int32)
        match = bool(np.array_equal(np.asarray(bits), b2))
    else:
        dec = jax.jit(lambda l: ldpc_decode(code, l, iters=args.iters,
                                            unroll=True))
        bits, info, ok = dec(llr)
        bits.block_until_ready()
        # correctness cross-check vs the CPU scan path
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            b2, i2, ok2 = ldpc_decode(jax.device_put(code, cpu),
                                      jax.device_put(llr, cpu),
                                      iters=args.iters)
        match = bool(np.array_equal(np.asarray(bits), np.asarray(b2)))

    # slope timing: block_until_ready no longer drains the tunnel queue
    # (bench/run.py:_force); each region ends in a tiny forced fetch and
    # the fixed sync cost cancels in the (T2-T1)/k difference
    def region(k):
        t0 = time.perf_counter()
        for _ in range(k):
            r = dec(llr)
        np.asarray(r[0][:1, :1])
        return time.perf_counter() - t0

    from slope import calibrated_slope
    med, k = calibrated_slope(region, trials=args.trials)
    tag = "pallas" if args.kernel else "xla"
    if med is None:
        print(json.dumps({
            "metric": f"ldpc_n{args.n}_it{args.iters}_b{args.batch}"
                      f"_{tag}_decode",
            "status": "measurement_unresolved", "kk": k,
            "matches_cpu": match,
            "backend": jax.devices()[0].platform}))
        return
    print(json.dumps({
        "metric": f"ldpc_n{args.n}_it{args.iters}_b{args.batch}_{tag}_decode",
        "coded_bits_per_s": args.batch * code.n / med,
        "ms_per_codeword": med * 1e3 / args.batch,
        "batch": args.batch,
        "ok": bool(np.asarray(jnp.all(ok))), "matches_cpu": match,
        "backend": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
