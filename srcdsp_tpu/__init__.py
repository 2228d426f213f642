"""srcdsp_tpu — a TPU-native software-radio DSP framework.

A from-scratch reimagining of the SrcDsp C++ primitive set (dogjin/SrcDsp;
capability contract in /root/repo/BASELINE.json `north_star`) as JAX/XLA
programs with Pallas TPU kernels:

- FIR and decimating FIR filters   (reference: template-per-sample C++ loops)
- NCO mixing                       (reference: phase-accumulator + LUT loops)
- Rational L/M resampling          (reference: polyphase template class)
- FFT transforms / overlap-save convolution
- FSK / PSK demodulation chains
- Polyphase channelization

Design: stateful C++ delay lines become *carried overlap buffers* threaded
through pure `(state, block) -> (state, block)` functions; per-channel C++
object state becomes vmapped/sharded pytree state; streams shard across TPU
meshes by channel (data parallel) and time-block (sequence parallel) with
overlap-save halo exchange over ICI.
"""

__version__ = "0.1.0"

from srcdsp_tpu import types  # noqa: F401
from srcdsp_tpu import ops  # noqa: F401
from srcdsp_tpu import chains  # noqa: F401
from srcdsp_tpu import io  # noqa: F401
from srcdsp_tpu import checkpoint  # noqa: F401
from srcdsp_tpu import fec  # noqa: F401
from srcdsp_tpu import gf2  # noqa: F401
from srcdsp_tpu import hdlc  # noqa: F401
from srcdsp_tpu import rs  # noqa: F401
from srcdsp_tpu import ldpc  # noqa: F401
from srcdsp_tpu import qcldpc  # noqa: F401
from srcdsp_tpu import turbo  # noqa: F401
from srcdsp_tpu import polar  # noqa: F401
from srcdsp_tpu import demap  # noqa: F401
from srcdsp_tpu import array  # noqa: F401
from srcdsp_tpu import mimo  # noqa: F401
from srcdsp_tpu import metrics  # noqa: F401

# heavier/optional subsystems stay import-on-demand:
#   srcdsp_tpu.dist     (meshes, halos, all_to_all)
#   srcdsp_tpu.kernels  (Pallas TPU kernels)
#   srcdsp_tpu.oracle   (builds the C++ golden model on first use)
