"""Monte-Carlo BER/BLER curves for the coding layer (symbol-level AWGN).

Not a CI test — a measurement tool: one JSON line per (scheme, Eb/N0)
with the bit error rate, block error rate, and the MC sample count.
Uncoded BPSK is included as the closed-form sanity anchor
(BER = Q(sqrt(2 Eb/N0))); the coded rows quantify the coding gains of
the framework's Viterbi, LDPC (flooding + layered), and turbo decoders
on identical channel models.

    python bench/ber_curves.py [--blocks 64] [--out ber.jsonl]

Runs on whatever backend the session provides; all decoders are jitted
and batched (vmap/batch axes), so the sweep is a handful of compiled
calls per point.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

# invoked as `python bench/ber_curves.py`: repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def qfunc(x):
    return 0.5 * math.erfc(x / math.sqrt(2.0))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=64,
                    help="MC blocks per point per scheme")
    ap.add_argument("--out", default="-")
    ap.add_argument("--ebn0", type=float, nargs="*",
                    default=[0.0, 1.0, 2.0, 3.0, 4.0])
    args = ap.parse_args(argv)

    import jax

    try:
        jax.devices()
    except RuntimeError:        # axon requested but not registered
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from srcdsp_tpu.fec import conv_encode, make_conv_code, \
        viterbi_decode
    from srcdsp_tpu.ldpc import ldpc_decode, ldpc_encode, make_ldpc_code, \
        make_regular_ldpc
    from srcdsp_tpu.qcldpc import ldpc_decode_layered, make_qc_base, \
        make_qc_ldpc
    from srcdsp_tpu.polar import make_polar, polar_decode, polar_encode
    from srcdsp_tpu.turbo import make_turbo, turbo_decode, turbo_encode

    out = open(args.out, "w") if args.out != "-" else sys.stdout
    rng = np.random.default_rng(0)

    def emit(rec):
        out.write(json.dumps(rec) + "\n")
        out.flush()

    def awgn_llr(bits, rate, ebn0_db):
        """BPSK + AWGN at Eb/N0 for code rate `rate`; returns LLRs."""
        sigma = math.sqrt(1.0 / (2.0 * rate * 10 ** (ebn0_db / 10)))
        y = (1.0 - 2.0 * bits) + sigma * rng.standard_normal(bits.shape)
        return (2.0 / sigma ** 2) * y

    # ---- schemes ----
    cc = make_conv_code(7, (0o133, 0o171))
    ldpc = make_ldpc_code(make_regular_ldpc(504, 3, 6, seed=0))
    zq = 21
    qc = make_qc_ldpc(make_qc_base(3, 6, zq, seed=0), zq)
    tc = make_turbo(512, seed=0)
    pc = make_polar(256, 128)

    vit = jax.jit(lambda s: viterbi_decode(cc, s))
    ldec = jax.jit(lambda l: ldpc_decode(ldpc, l, iters=30))
    qdec = jax.jit(lambda l: ldpc_decode_layered(qc, l, zq, iters=15))
    tdec = jax.jit(lambda a, b, c: turbo_decode(tc, a, b, c, iters=6))
    pdec = jax.jit(jax.vmap(lambda l: polar_decode(pc, l)))

    for ebn0 in args.ebn0:
        t0 = time.time()
        # uncoded BPSK: empirical + closed form
        u = rng.integers(0, 2, (args.blocks, 1024)).astype(np.float64)
        llr = awgn_llr(u, 1.0, ebn0)
        ber = float(np.mean((llr < 0) != (u > 0.5)))
        emit({"scheme": "uncoded-bpsk", "ebn0_db": ebn0, "ber": ber,
              "theory": qfunc(math.sqrt(2 * 10 ** (ebn0 / 10))),
              "bits": int(u.size)})

        # K=7 rate-1/2 Viterbi (terminated blocks of 512)
        errs = blkerrs = 0
        for _ in range(max(1, args.blocks // 8)):
            ub = rng.integers(0, 2, (8, 512))
            coded = np.asarray(conv_encode(cc, jnp.asarray(ub)))
            llr = awgn_llr(coded.astype(np.float64), 0.5, ebn0)
            hat = np.asarray(jax.vmap(vit)(jnp.asarray(llr, jnp.float32)))
            errs += int((hat[:, :512] != ub).sum())
            blkerrs += int((hat[:, :512] != ub).any(axis=-1).sum())
        nb = max(1, args.blocks // 8) * 8
        emit({"scheme": "viterbi-k7-r12", "ebn0_db": ebn0,
              "ber": errs / (nb * 512), "bler": blkerrs / nb,
              "bits": nb * 512})

        # LDPC (504, 3, 6) flooding
        ub = rng.integers(0, 2, (args.blocks, ldpc.k))
        cw = np.asarray(ldpc_encode(ldpc, jnp.asarray(ub))).astype(np.float64)
        llr = awgn_llr(cw, ldpc.k / ldpc.n, ebn0)
        _, info, ok = ldec(jnp.asarray(llr, jnp.float32))
        info = np.asarray(info)
        emit({"scheme": "ldpc-504-r12-flood30", "ebn0_db": ebn0,
              "ber": float((info != ub).mean()),
              "bler": float((info != ub).any(axis=-1).mean()),
              "bits": int(ub.size)})

        # QC-LDPC layered (126, 3, 6 protograph x z)
        ub = rng.integers(0, 2, (args.blocks, qc.k))
        cw = np.asarray(ldpc_encode(qc, jnp.asarray(ub))).astype(np.float64)
        llr = awgn_llr(cw, qc.k / qc.n, ebn0)
        _, info, ok = qdec(jnp.asarray(llr, jnp.float32))
        info = np.asarray(info)
        emit({"scheme": f"qcldpc-{qc.n}-layered15", "ebn0_db": ebn0,
              "ber": float((info != ub).mean()),
              "bler": float((info != ub).any(axis=-1).mean()),
              "bits": int(ub.size)})

        # polar (256, 128) SC
        ub = rng.integers(0, 2, (args.blocks, pc.k))
        cw = np.asarray(polar_encode(pc, jnp.asarray(ub))).astype(np.float64)
        llr = awgn_llr(cw, pc.k / pc.n, ebn0)
        info, _ = pdec(jnp.asarray(llr, jnp.float32))
        info = np.asarray(info)
        emit({"scheme": "polar-256-r12-sc", "ebn0_db": ebn0,
              "ber": float((info != ub).mean()),
              "bler": float((info != ub).any(axis=-1).mean()),
              "bits": int(ub.size)})

        # turbo N=512 rate ~1/3
        errs = blkerrs = 0
        for _ in range(max(1, args.blocks // 4)):
            for _b in range(4):
                ub = rng.integers(0, 2, 512)
                s, p1, p2 = (np.asarray(a).astype(np.float64)
                             for a in turbo_encode(tc, jnp.asarray(ub)))
                rate = 512 / (s.size + p1.size + p2.size)
                la = [jnp.asarray(awgn_llr(a, rate, ebn0), jnp.float32)
                      for a in (s, p1, p2)]
                hat, _ = tdec(*la)
                errs += int((np.asarray(hat) != ub).sum())
                blkerrs += int((np.asarray(hat) != ub).any())
        nb = max(1, args.blocks // 4) * 4
        emit({"scheme": "turbo-512-r13-it6", "ebn0_db": ebn0,
              "ber": errs / (nb * 512), "bler": blkerrs / nb,
              "bits": nb * 512})
        print(f"ebn0 {ebn0}: {time.time() - t0:.1f}s", file=sys.stderr)

    if out is not sys.stdout:
        out.close()


if __name__ == "__main__":
    main()
