"""Elastic recovery across a TOPOLOGY CHANGE (SURVEY.md §5 failure row,
upgraded): a 2-process `jax.distributed` "slice" streams the distributed
pipeline with per-buffer checkpoints, is killed after buffer 3, and a
SINGLE-process continuation restores the checkpoint on a fresh local mesh
and finishes the stream. Exit status asserts the stitched output is
bit-identical to an uninterrupted run.

    python bench/fault_injection_multihost.py

This exercises the real recovery sequence a pod loss needs: persistent
(tiny) replicated state, a stream position, re-initialization under a
DIFFERENT device topology (8 devices across 2 processes -> 8 devices in
1 process), and bit-exact continuation — the carried-state design makes
the mesh shape invisible to the math.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PORT = int(os.environ.get("SRCDSP_MHF_PORT", "47917"))
NPROC = 2
DEV_PER_PROC = 4
M, NBUF, STOP_AFTER = 16, 6, 3
CKPT = "/tmp/srcdsp_mh_fault_ck"
OUTDIR = "/tmp/srcdsp_mh_fault_out"


def _pipeline_pieces():
    import jax.numpy as jnp
    from srcdsp_tpu.chains.channelizer import design_prototype, pad_prototype
    from srcdsp_tpu.ops.window import lowpass
    from srcdsp_tpu.testing.signals import complex_awgn
    import jax

    pre = jnp.asarray(lowpass(48, 0.45))
    proto = design_prototype(M, taps_per_phase=4)
    tproto = int(pad_prototype(proto, M).shape[0])
    x = complex_awgn(jax.random.PRNGKey(3), (NBUF * 8 * M * 16,))
    return pre, proto, tproto, x


def _fresh_state(tproto):
    import jax.numpy as jnp
    return (jnp.zeros(47, jnp.complex64),
            jnp.zeros(tproto - 1, jnp.complex64))


def worker(proc_id: int) -> None:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEV_PER_PROC}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{PORT}",
                               num_processes=NPROC, process_id=proc_id)
    import numpy as np
    import jax.experimental.multihost_utils as mhu
    from jax.sharding import PartitionSpec as P

    from srcdsp_tpu import checkpoint
    from srcdsp_tpu.dist import make_mesh
    from srcdsp_tpu.dist.channelize import channelize_time_sharded_stream
    from srcdsp_tpu.dist.halo import fir_time_sharded_stream

    mesh = make_mesh(time=NPROC * DEV_PER_PROC)
    pre, proto, tproto, x = _pipeline_pieces()
    xnp = np.asarray(x)
    n = xnp.shape[-1] // NBUF
    per_proc = n // NPROC
    tail_f, tail_c = _fresh_state(tproto)

    for b in range(STOP_AFTER):
        xb_local = xnp[b * n + proc_id * per_proc:
                       b * n + (proc_id + 1) * per_proc]
        xb = mhu.host_local_array_to_global_array(xb_local, mesh, P("time"))
        tail_f, y = fir_time_sharded_stream(pre, tail_f, xb, mesh)
        tail_c, banks = channelize_time_sharded_stream(proto, tail_c, y,
                                                       M, mesh)
        banks_h = mhu.process_allgather(banks, tiled=True)
        if proc_id == 0:
            np.save(os.path.join(OUTDIR, f"buf{b}.npy"), np.asarray(banks_h))
            checkpoint.save(CKPT, (tail_f, tail_c), block_index=b + 1)
    print(f"worker {proc_id}: streamed {STOP_AFTER} buffers, dying now "
          f"(simulated slice loss)", flush=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]))
        return

    os.makedirs(OUTDIR, exist_ok=True)
    for f in os.listdir(OUTDIR):
        os.remove(os.path.join(OUTDIR, f))

    # phase 1: the 2-process slice streams, checkpoints, and "dies"
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "worker", str(i)],
        cwd=REPO) for i in range(NPROC)]
    codes = [p.wait(timeout=600) for p in procs]
    assert not any(codes), f"phase-1 workers failed: {codes}"

    # phase 2: single-process recovery on a DIFFERENT topology
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from srcdsp_tpu import checkpoint
    from srcdsp_tpu.chains.channelizer import channelize_full
    from srcdsp_tpu.dist import make_mesh, time_sharding
    from srcdsp_tpu.dist.channelize import channelize_time_sharded_stream
    from srcdsp_tpu.dist.halo import fir_time_sharded_stream
    from srcdsp_tpu.ops.fir import fir_full

    pre, proto, tproto, x = _pipeline_pieces()
    xnp = np.asarray(x)
    n = xnp.shape[-1] // NBUF
    mesh = make_mesh(time=8)
    state, start = checkpoint.restore(CKPT, _fresh_state(tproto))
    print(f"recovered at buffer {start} on a fresh single-process mesh",
          flush=True)
    tail_f, tail_c = state
    outs = []
    for b in range(start, NBUF):
        xb = jax.device_put(jnp.asarray(xnp[b * n:(b + 1) * n]),
                            time_sharding(mesh))
        tail_f, y = fir_time_sharded_stream(pre, tail_f, xb, mesh)
        tail_c, banks = channelize_time_sharded_stream(proto, tail_c, y,
                                                       M, mesh)
        outs.append(np.asarray(banks))

    got = np.concatenate(
        [np.load(os.path.join(OUTDIR, f"buf{b}.npy"))
         for b in range(STOP_AFTER)] + outs, axis=-1)
    ref = np.asarray(channelize_full(proto, fir_full(pre, jnp.asarray(xnp)),
                                     M))
    assert np.array_equal(got, ref), \
        "recovered stream != uninterrupted single-process run"
    print("multihost fault injection: 2-process slice lost after buffer 3, "
          "single-process recovery BIT-EXACT", flush=True)


if __name__ == "__main__":
    main()
