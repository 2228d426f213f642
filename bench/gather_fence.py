"""Chip-vs-CPU decision-equality fence for vmapped/batched gather sites.

Round 4 found the axon backend silently MISCOMPILES a >=4096-lane
vmapped scan+gather graph (turbo BCJR decisions diverged from CPU at
B=4096, fine at B<=2048 — BASELINE.md round-4 note). The workaround was
the lane-native `turbo_decode_batch`; this probe turns that one-off
finding into a systematic guard: every gather-bearing serving site runs
the SAME jitted graph on the chip and on CPU across a batch-size sweep,
and any decision mismatch is a red envelope entry.

One site per process (`--site`), because a failed axon dispatch can
poison later ops in the same process (round-3 finding) and a miscompile
probe must never inherit a poisoned process. `--all` spawns one
subprocess per site and aggregates.

Sites (the serving gather inventory):
  turbo_vmap    vmapped BCJR scan + static-take interleaver — the known
                cliff (expect MISMATCH at B=4096, green below)
  turbo_batch   lane-native [T, B] BCJR — the workaround (expect green)
  polar_sc      vmapped SC (elementwise tree + final jnp.take)
  polar_scl     one-hot SCL (einsum path perms, rank one-hots, take)
  farrow        cubic-Lagrange interpolator (jnp.take of a traced
                [cap, 4] window index grid), f32 plane form
  tracker_psk   Gardner/Costas plane scans (take_along_axis interps)
  rs            RS(255,223) decode (log/exp table jnp.take chains,
                vmapped Chien/Forney)
  take_micro    bare take_along_axis + traced jnp.take at wide lanes

    python bench/gather_fence.py --site turbo_vmap
    python bench/gather_fence.py --all        # subprocess per site
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SITES = ["turbo_vmap", "turbo_batch", "polar_sc", "polar_scl", "farrow",
         "tracker_psk", "rs", "take_micro"]


def _emit(site, size, match, note=""):
    rec = {"probe": "gather_fence", "site": site, "size": size,
           "match": bool(match)}
    if note:
        rec["note"] = note
    print(json.dumps(rec), flush=True)
    return bool(match)


def _run_both(fn, *args):
    """Same jitted fn on default (chip) and CPU; returns (chip, cpu)."""
    import jax
    cpu = jax.local_devices(backend="cpu")[0]
    chip_args = args
    out_chip = [np.asarray(o) for o in jax.tree_util.tree_leaves(
        fn(*chip_args))]
    cpu_args = [jax.device_put(a, cpu) for a in args]
    out_cpu = [np.asarray(o) for o in jax.tree_util.tree_leaves(
        fn(*cpu_args))]
    return out_chip, out_cpu


def site_turbo(layout, sizes):
    import jax
    import jax.numpy as jnp
    from srcdsp_tpu.turbo import (make_turbo, turbo_decode,
                                  turbo_decode_batch, turbo_encode)
    t, iters = 512, 2
    tc = make_turbo(t, seed=0)
    rng = np.random.default_rng(0)
    ok = True
    for b in sizes:
        u = rng.integers(0, 2, (b, t))
        sys_b, par1, par2 = jax.vmap(lambda x: turbo_encode(tc, x))(
            jnp.asarray(u))
        sigma = 10.0 ** (-1.5 / 20.0)

        def ch(bits):
            return jnp.asarray(
                2.0 / sigma ** 2 * ((1.0 - 2.0 * np.asarray(bits))
                                    + sigma * rng.standard_normal(
                                        bits.shape)), jnp.float32)

        ls, lp1, lp2 = ch(sys_b), ch(par1), ch(par2)
        if layout == "batch":
            dec = jax.jit(lambda a, c, d: turbo_decode_batch(
                tc, a, c, d, iters=iters)[0])
        else:
            dec = jax.jit(jax.vmap(
                lambda a, c, d: turbo_decode(tc, a, c, d, iters=iters)[0]))
        chip, cpu = _run_both(dec, ls, lp1, lp2)
        ok &= _emit(f"turbo_{layout}", b,
                    all(np.array_equal(a, c) for a, c in zip(chip, cpu)))
    return ok


def site_polar_sc(sizes):
    import jax
    import jax.numpy as jnp
    from srcdsp_tpu.polar import make_polar, polar_decode, polar_encode
    code = make_polar(256, 128)
    rng = np.random.default_rng(1)
    ok = True
    for b in sizes:
        u = rng.integers(0, 2, (b, code.k))
        cw = jax.vmap(lambda x: polar_encode(code, x))(jnp.asarray(u))
        sigma = 10.0 ** (-3.0 / 20.0)
        llr = jnp.asarray(
            2.0 / sigma ** 2 * ((1.0 - 2.0 * np.asarray(cw))
                                + sigma * rng.standard_normal(cw.shape)),
            jnp.float32)
        dec = jax.jit(jax.vmap(lambda l: polar_decode(code, l)[0]))
        chip, cpu = _run_both(dec, llr)
        ok &= _emit("polar_sc", b,
                    all(np.array_equal(a, c) for a, c in zip(chip, cpu)))
    return ok


def site_polar_scl(sizes):
    import jax
    import jax.numpy as jnp
    from srcdsp_tpu.polar import (make_polar, polar_decode_list_onehot,
                                  polar_encode)
    code = make_polar(128, 64)
    rng = np.random.default_rng(2)
    ok = True
    for b in sizes:
        u = rng.integers(0, 2, (b, code.k))
        cw = jax.vmap(lambda x: polar_encode(code, x))(jnp.asarray(u))
        sigma = 10.0 ** (-2.0 / 20.0)
        llr = jnp.asarray(
            2.0 / sigma ** 2 * ((1.0 - 2.0 * np.asarray(cw))
                                + sigma * rng.standard_normal(cw.shape)),
            jnp.float32)
        dec = jax.jit(jax.vmap(
            lambda l: polar_decode_list_onehot(code, l, 8, fast=True)[0]))
        chip, cpu = _run_both(dec, llr)
        ok &= _emit("polar_scl", b,
                    all(np.array_equal(a, c) for a, c in zip(chip, cpu)))
    return ok


def site_farrow(sizes):
    import jax
    import jax.numpy as jnp
    from srcdsp_tpu.ops.farrow import farrow_apply
    from srcdsp_tpu.ops.farrow import FarrowState
    rng = np.random.default_rng(3)
    ok = True
    for c in sizes:
        n = 1 << 14
        x = rng.standard_normal((c, n)).astype(np.float32)
        st = FarrowState(tail=jnp.zeros((c, 3), jnp.float32),
                         p=jnp.zeros((), jnp.int32))
        fn = jax.jit(lambda s, v: farrow_apply(s, v, 3, 4))

        def decisions(s, v):
            _, (y, valid) = fn(s, v)
            return jnp.where(valid[None, :], y, 0.0)

        chip, cpu = _run_both(jax.jit(decisions), st, jnp.asarray(x))
        # float site: the Lagrange einsum runs 1-pass bf16 on the MXU, so
        # exact equality cannot hold; a gather miscompile pulls WRONG
        # SAMPLES (O(1) errors), bf16 rounding is O(1e-2) — threshold
        # between them
        worst = max(float(np.abs(a - b).max())
                    for a, b in zip(chip, cpu))
        ok &= _emit("farrow", c, worst < 0.1,
                    note=f"max_abs_err={worst:.2e} (bf16-rounding tier)")
    return ok


def site_tracker_psk(sizes):
    import jax
    import jax.numpy as jnp
    from srcdsp_tpu.chains.psk import make_psk_params
    from srcdsp_tpu.chains.tracking_planes import (psk_track_planes_apply,
                                                   psk_track_planes_init)
    from srcdsp_tpu.ops.resample import resample_full
    cpu = jax.local_devices(backend="cpu")[0]
    ok = True
    for c in sizes:
        order, sps = 4, 4
        params = make_psk_params(0.0, decim=1, sps=sps, order=order)
        with jax.default_device(cpu):
            rng = np.random.default_rng(4)
            nsym = 2048 + 64
            data = rng.integers(0, order, (c, nsym))
            sym = np.exp(2j * np.pi * (data + 0.5) / order)
            clean = np.asarray(jax.vmap(
                lambda s: resample_full(params.taps, s, up=sps, down=1))(
                    jnp.asarray(sym.astype(np.complex64))))
        n = 2048 * sps
        planes = np.stack([clean.real, clean.imag],
                          axis=1)[:, :, :n].astype(np.float32)
        st = psk_track_planes_init(params, c)
        fn = jax.jit(lambda s, p: psk_track_planes_apply(params, s, p)[1][0])
        chip, cpu_out = _run_both(fn, st, jnp.asarray(planes))
        ok &= _emit("tracker_psk", c,
                    all(np.array_equal(a, b) for a, b in zip(chip, cpu_out)))
    return ok


def site_rs(sizes):
    import jax
    import jax.numpy as jnp
    from srcdsp_tpu.rs import make_rs_code, rs_decode, rs_encode
    code = make_rs_code(255, 223)
    rng = np.random.default_rng(5)
    ok = True
    for b in sizes:
        msg = rng.integers(0, 256, (b, code.k)).astype(np.uint8)
        cw = np.array(rs_encode(code, jnp.asarray(msg)), copy=True)
        # up to t errors per word
        for i in range(b):
            ne = rng.integers(0, code.t + 1)
            pos = rng.choice(code.n, ne, replace=False)
            cw[i, pos] ^= rng.integers(1, 256, ne).astype(np.uint8)
        dec = jax.jit(lambda r: rs_decode(code, r))
        chip, cpu = _run_both(dec, jnp.asarray(cw))
        ok &= _emit("rs", b,
                    all(np.array_equal(a, c) for a, c in zip(chip, cpu)))
    return ok


def site_take_micro(sizes):
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(6)
    ok = True
    for b in sizes:
        n = 4096
        x = rng.standard_normal((b, n)).astype(np.float32)
        idx = rng.integers(0, n, (b, n)).astype(np.int32)

        def fn(xv, iv):
            a = jnp.take_along_axis(xv, iv, axis=-1)
            t = jnp.take(xv[0], iv[0])                 # traced-index take
            return a + t[None, :]

        chip, cpu = _run_both(jax.jit(fn), jnp.asarray(x), jnp.asarray(idx))
        ok &= _emit("take_micro", b,
                    all(np.array_equal(a, c) for a, c in zip(chip, cpu)))
    return ok


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--site", choices=SITES)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--sizes", type=int, nargs="*", default=None)
    args = ap.parse_args(argv)

    if args.all:
        fails = []
        for s in SITES:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--site", s],
                cwd=os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))))
            if r.returncode != 0:
                fails.append(s)
        print(json.dumps({"probe": "gather_fence", "summary": True,
                          "red_sites": fails}), flush=True)
        return
    if not args.site:
        raise SystemExit("--site or --all required")

    import jax  # noqa: F401  (device init after arg parsing)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    s = args.site
    if s == "turbo_vmap":
        ok = site_turbo("vmap", args.sizes or [512, 2048, 4096])
    elif s == "turbo_batch":
        ok = site_turbo("batch", args.sizes or [512, 2048, 4096])
    elif s == "polar_sc":
        ok = site_polar_sc(args.sizes or [2048, 8192, 32768])
    elif s == "polar_scl":
        ok = site_polar_scl(args.sizes or [256, 1024, 4096])
    elif s == "farrow":
        ok = site_farrow(args.sizes or [8, 64, 256])
    elif s == "tracker_psk":
        ok = site_tracker_psk(args.sizes or [4, 16, 64])
    elif s == "rs":
        ok = site_rs(args.sizes or [32, 128, 256])
    else:
        ok = site_take_micro(args.sizes or [512, 2048, 8192, 16384])
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
