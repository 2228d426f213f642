"""On-chip probes for the remaining FEC decoders: Viterbi (fec.py) and
Reed-Solomon (rs.py) on the axon backend. Correctness-gated like the
LDPC/turbo/polar probes: chip decisions must match the CPU tier exactly;
throughput is slope-timed (bench/run.py:_force note).

One decoder per process (a failed lazy axon op can poison later
dispatches — verify-skill finding), so run:

    python bench/fec_onchip.py viterbi [--batch 512] [--t 512]
    python bench/fec_onchip.py rs      [--batch 512]
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force(y):
    import jax
    leaf = jax.tree_util.tree_leaves(y)[0]
    try:
        return np.asarray(leaf[tuple(slice(0, 1) for _ in leaf.shape)])
    except Exception:
        return np.asarray(leaf)


def _slope(step, args, trials=5):
    from slope import calibrated_slope

    def region(k):
        t0 = time.perf_counter()
        y = None
        for _ in range(k):
            y = step(*args)
        _force(y)
        return time.perf_counter() - t0

    med, k = calibrated_slope(region, trials=trials)
    if med is None:
        raise SystemExit(f"slope unresolved at k={k} — workload too "
                         f"cheap for the sync jitter; raise the batch")
    return med


def viterbi(batch=512, t=512, noise_std=0.6):
    import jax
    import jax.numpy as jnp
    from srcdsp_tpu.fec import (bpsk_soft, conv_encode, make_conv_code,
                                viterbi_decode)

    code = make_conv_code(7, [0o171, 0o133])
    rng = np.random.default_rng(0)
    u = rng.integers(0, 2, (batch, t))
    coded = jax.vmap(lambda b: conv_encode(code, b))(jnp.asarray(u))
    soft = np.asarray(jax.vmap(
        lambda c, k: bpsk_soft(c, k, noise_std=noise_std))(
            coded, jax.random.split(jax.random.PRNGKey(1), batch)))
    softj = jnp.asarray(soft)

    dec = jax.jit(lambda s: viterbi_decode(code, s))   # batched natively
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        d_cpu = np.asarray(dec(jax.device_put(softj, cpu)))
    tpu = jax.devices()[0]
    sj = jax.device_put(softj, tpu)
    d_tpu = np.asarray(dec(sj))
    match = np.array_equal(d_cpu, d_tpu)
    sec = _slope(dec, (sj,))
    n_coded = soft.shape[-1]
    print(json.dumps({
        "metric": f"viterbi_k7_t{t}_b{batch}_decode",
        "matches_cpu": bool(match),
        "info_ber_vs_tx": float(np.mean(d_tpu != u)),
        "coded_bits_per_s": batch * n_coded / sec,
        "ms_per_codeword": sec / batch * 1e3,
        "backend": jax.default_backend(),
    }), flush=True)


def rs(batch=512, n=255, k=223, nerr=16):
    import jax
    import jax.numpy as jnp
    from srcdsp_tpu.rs import make_rs_code, rs_decode, rs_encode

    code = make_rs_code(n, k)
    rng = np.random.default_rng(0)
    msg = rng.integers(0, 256, (batch, k))
    cw = np.asarray(jax.vmap(lambda m: rs_encode(code, m))(jnp.asarray(msg)))
    recv = cw.copy()
    for b in range(batch):                  # t = nerr byte errors per word
        pos = rng.choice(n, nerr, replace=False)
        recv[b, pos] ^= rng.integers(1, 256, nerr)
    recvj = jnp.asarray(recv)

    dec = jax.jit(lambda r: rs_decode(code, r))        # batched natively
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        out_cpu = dec(jax.device_put(recvj, cpu))
        d_cpu = np.asarray(out_cpu[0])
        ok_cpu = np.asarray(out_cpu[1])
    tpu = jax.devices()[0]
    rj = jax.device_put(recvj, tpu)
    out = dec(rj)
    d_tpu = np.asarray(out[0])
    ok_tpu = np.asarray(out[1])
    match = np.array_equal(d_cpu, d_tpu) and np.array_equal(ok_cpu, ok_tpu)
    corrected = bool(np.all(d_cpu == msg))
    sec = _slope(dec, (rj,))
    print(json.dumps({
        "metric": f"rs_{n}_{k}_e{nerr}_b{batch}_decode",
        "matches_cpu": bool(match),
        "all_corrected": corrected,
        "ok_fraction_chip": float(np.mean(ok_tpu)),
        "coded_bits_per_s": batch * n * 8 / sec,
        "ms_per_codeword": sec / batch * 1e3,
        "backend": jax.default_backend(),
    }), flush=True)


def bch(batch=4096, m=5, t=2):
    """Round-5 family addition: binary BCH decode on-chip, decisions
    gated against CPU (the X58 correctness row)."""
    import jax
    import jax.numpy as jnp
    from srcdsp_tpu.bch import bch_decode, bch_encode, make_bch_code

    code = make_bch_code(m, t)
    rng = np.random.default_rng(0)
    msg = rng.integers(0, 2, (batch, code.k))
    cw = np.asarray(bch_encode(code, jnp.asarray(msg)))
    recv = cw.copy()
    for b in range(batch):
        pos = rng.choice(code.n, t, replace=False)
        recv[b, pos] ^= 1
    recvj = jnp.asarray(recv)

    dec = jax.jit(lambda r: bch_decode(code, r))
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        out_cpu = dec(jax.device_put(recvj, cpu))
        d_cpu = np.asarray(out_cpu[0])
        ok_cpu = np.asarray(out_cpu[1])
    tpu = jax.devices()[0]
    rj = jax.device_put(recvj, tpu)
    out = dec(rj)
    d_tpu = np.asarray(out[0])
    ok_tpu = np.asarray(out[1])
    match = np.array_equal(d_cpu, d_tpu) and np.array_equal(ok_cpu, ok_tpu)
    corrected = bool(np.all(d_cpu == msg))
    sec = _slope(dec, (rj,))
    print(json.dumps({
        "metric": f"bch_{code.n}_{code.k}_t{t}_b{batch}_decode",
        "matches_cpu": bool(match),
        "all_corrected": corrected,
        "coded_bits_per_s": batch * code.n / sec,
        "ms_per_codeword": sec / batch * 1e3,
        "backend": jax.default_backend(),
    }), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("which", choices=["viterbi", "rs", "bch"])
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--t", type=int, default=512)
    ap.add_argument("--bch-m", type=int, default=5)
    ap.add_argument("--bch-t", type=int, default=2)
    args = ap.parse_args()
    if args.which == "viterbi":
        viterbi(batch=args.batch, t=args.t)
    elif args.which == "bch":
        bch(batch=args.batch, m=args.bch_m, t=args.bch_t)
    else:
        rs(batch=args.batch)
