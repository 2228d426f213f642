"""File -> chain -> file CLI driver (SURVEY.md §1.1 L4, §3.1a).

The reference ships main()-style binaries that stream a capture file
through a demod chain and write the result. Equivalent here:

    python -m srcdsp_tpu.cli fsk  in.iq bits.out --center 0.11 --decim 4 --sps 8
    python -m srcdsp_tpu.cli psk  in.iq syms.out --center 0.17 --decim 2 --sps 4 --order 4
    python -m srcdsp_tpu.cli fir  in.iq out.iq   --taps 64 --cutoff 0.1 --decim 2

Streams in fixed blocks with carried state (bit-exact vs one-shot),
checkpoints every --ckpt-every blocks, and resumes automatically when the
checkpoint file matches (--ckpt PATH).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _stream(args, params, state, apply_fn, out_is_bits: bool):
    import jax.numpy as jnp

    from srcdsp_tpu import checkpoint
    from srcdsp_tpu.io.capture import read_capture_blocks

    start_block = 0
    if args.ckpt and checkpoint.exists(args.ckpt):
        state, start_block = checkpoint.restore(args.ckpt, state)
        print(f"resumed from block {start_block}", file=sys.stderr)

    outputs = []
    i = start_block - 1
    for i, xb in enumerate(read_capture_blocks(args.infile, args.block,
                                               start_block=start_block),
                           start=start_block):
        state, out = apply_fn(params, state, jnp.asarray(xb))
        outputs.append(np.asarray(out[0] if isinstance(out, tuple) else out))
        if args.ckpt and args.ckpt_every and (i + 1) % args.ckpt_every == 0:
            checkpoint.save(args.ckpt, state, block_index=i + 1)
    if not outputs:
        print("no full blocks to process", file=sys.stderr)
        return
    cat = np.concatenate(outputs, axis=-1)
    if out_is_bits:
        cat.astype(np.uint8).tofile(args.outfile)
    else:
        from srcdsp_tpu.io.capture import CaptureMeta, write_capture
        write_capture(args.outfile, cat.astype(np.complex64),
                      CaptureMeta(fmt="cf32"))
    print(f"processed blocks {start_block}..{i} -> {args.outfile}",
          file=sys.stderr)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="srcdsp_tpu.cli", description=__doc__)
    p.add_argument("chain", choices=["fsk", "psk", "fir"])
    p.add_argument("infile")
    p.add_argument("outfile")
    p.add_argument("--center", type=float, default=0.0,
                   help="channel center, cycles/sample")
    p.add_argument("--decim", type=int, default=4)
    p.add_argument("--sps", type=int, default=8)
    p.add_argument("--order", type=int, default=4, help="M for M-PSK")
    p.add_argument("--dev", type=float, default=0.05,
                   help="FSK deviation, cycles/sample at the decimated rate")
    p.add_argument("--taps", type=int, default=64)
    p.add_argument("--cutoff", type=float, default=0.1)
    p.add_argument("--block", type=int, default=1 << 16)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--ckpt-every", type=int, default=16)
    args = p.parse_args(argv)

    # block must be a whole number of output symbols / decimated samples
    q = args.decim * args.sps if args.chain in ("fsk", "psk") else args.decim
    args.block -= args.block % q

    if args.chain == "fsk":
        from srcdsp_tpu.chains.fsk import fsk_apply, fsk_init, make_fsk_params
        params = make_fsk_params(args.center, args.taps, args.cutoff,
                                 args.decim, args.sps, args.dev)
        _stream(args, params, fsk_init(params), fsk_apply, out_is_bits=True)
    elif args.chain == "psk":
        from srcdsp_tpu.chains.psk import make_psk_params, psk_apply, psk_init
        params = make_psk_params(args.center, args.decim, args.sps,
                                 order=args.order)
        _stream(args, params, psk_init(params), psk_apply, out_is_bits=True)
    else:
        import jax.numpy as jnp

        from srcdsp_tpu.ops.fir import fir_apply, fir_init
        from srcdsp_tpu.ops.nco import freq_to_word, nco_apply, nco_init
        from srcdsp_tpu.ops.window import lowpass

        taps = jnp.asarray(lowpass(args.taps, args.cutoff))
        word = freq_to_word(-args.center)

        def apply_fn(params, state, xb):
            nco_s, fir_s = state
            nco_s, m = nco_apply(word, nco_s, xb)
            fir_s, y = fir_apply(taps, fir_s, m, decim=args.decim)
            return (nco_s, fir_s), y

        _stream(args, None, (nco_init(), fir_init(args.taps)), apply_fn,
                out_is_bits=False)


if __name__ == "__main__":
    main()
