"""Distribution layer (SURVEY.md §2 N2, §2.1): mesh, halos, re-shards.

The reference is single-threaded C++ with no communication layer; this is
the new framework's first-class addition. Streams shard two ways:

- **channel parallelism** (the DP analog): independent channels on
  different chips — pure `NamedSharding`, no collectives;
- **time-block parallelism** (the SP/ring analog): one long stream split
  into contiguous blocks; FIR/overlap-save ops need the last taps-1 samples
  of the left neighbor — one `ppermute` halo per chain step over ICI;
- **all-to-all re-shard** (the Ulysses analog): the channelizer turns a
  time-sharded wideband stream into a channel-sharded bank output with a
  single `lax.all_to_all` at the polyphase/FFT boundary.

Everything here is `shard_map`-based: XLA emits the collectives and
schedules them onto ICI; there is no hand-rolled transport.
"""

from srcdsp_tpu.dist.mesh import make_mesh, time_sharding, channel_sharding  # noqa: F401
from srcdsp_tpu.dist.halo import halo_from_left, fir_time_sharded, shift_from_left  # noqa: F401
from srcdsp_tpu.dist.channelize import channelize_time_sharded  # noqa: F401
