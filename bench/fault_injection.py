"""Fault-injection / elastic-recovery demonstration (SURVEY.md §5).

Not a CI test (SURVEY marks this row "documented, not CI"): a runnable
script that streams a capture through the DISTRIBUTED pipeline (time-sharded
halo FIR -> all_to_all channelizer) on the fake 8-device mesh, checkpoints
every buffer, then simulates losing the whole slice mid-run — all live
state and device buffers discarded — and resumes from the last checkpoint
in a fresh mesh. Exit status asserts the recovered output is bit-identical
to an uninterrupted run.

    python bench/fault_injection.py

On a real pod the same flow applies: `checkpoint.save_orbax` persists the
(tiny) replicated state pytree per host; after host loss, re-initialize
`jax.distributed`, rebuild the mesh, `restore_orbax`, seek the capture to
the recorded buffer index, continue. The carried state is a few KB, so
checkpoint cadence is free.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def main() -> None:
    from srcdsp_tpu import checkpoint
    from srcdsp_tpu.chains.channelizer import (
        channelize_full, design_prototype, pad_prototype)
    from srcdsp_tpu.dist import make_mesh, time_sharding
    from srcdsp_tpu.dist.channelize import channelize_time_sharded_stream
    from srcdsp_tpu.dist.halo import fir_time_sharded_stream
    from srcdsp_tpu.ops.fir import fir_full
    from srcdsp_tpu.ops.window import lowpass
    from srcdsp_tpu.testing.signals import complex_awgn

    m, nbuf = 16, 6
    pre = jnp.asarray(lowpass(48, 0.45))
    proto = design_prototype(m, taps_per_phase=4)
    tproto = int(pad_prototype(proto, m).shape[0])
    x = complex_awgn(jax.random.PRNGKey(3), (nbuf * 8 * m * 16,))
    n = x.shape[-1] // nbuf
    ckpt = "/tmp/srcdsp_fault_ck"

    def fresh_state():
        return (jnp.zeros(47, jnp.complex64),
                jnp.zeros(tproto - 1, jnp.complex64))

    def run(start, state, mesh, stop_after=None):
        outs = []
        tail_f, tail_c = state
        for b in range(start, nbuf):
            xb = jax.device_put(x[b * n:(b + 1) * n], time_sharding(mesh))
            tail_f, y = fir_time_sharded_stream(pre, tail_f, xb, mesh)
            tail_c, banks = channelize_time_sharded_stream(
                proto, tail_c, y, m, mesh)
            outs.append(np.asarray(banks))
            checkpoint.save(ckpt, (tail_f, tail_c), block_index=b + 1)
            if stop_after is not None and b + 1 == stop_after:
                return outs, None
        return outs, (tail_f, tail_c)

    # uninterrupted reference (single device, from rest)
    ref = np.asarray(channelize_full(proto, fir_full(pre, x), m))

    # run until the "failure" after buffer 3
    mesh = make_mesh(time=8)
    outs_a, _ = run(0, fresh_state(), mesh, stop_after=3)
    print("simulated slice loss after buffer 3; discarding all live state",
          file=sys.stderr)

    # recovery: fresh mesh, restore, seek, continue
    mesh2 = make_mesh(time=8)
    state, start = checkpoint.restore(ckpt, fresh_state())
    print(f"restored checkpoint at buffer {start}", file=sys.stderr)
    outs_b, _ = run(start, state, mesh2)

    got = np.concatenate(outs_a + outs_b, axis=-1)
    assert np.array_equal(got, ref), "recovered stream != uninterrupted run"
    print("fault-injection recovery: BIT-EXACT across the failure", flush=True)


if __name__ == "__main__":
    main()
