"""Pallas TPU kernels (SURVEY.md §1.2 T1): the hand-scheduled hot path."""

from srcdsp_tpu.kernels.mixfir import (  # noqa: F401
    MixFirKernel, make_mix_fir_kernel, make_mix_fir_kernel_mc,
    mix_fir_decim_pallas, mix_fir_decim_pallas_mc,
)
from srcdsp_tpu.kernels.resample_pallas import (  # noqa: F401
    combine_fir_resample_taps, make_mix_resample_kernel,
    make_mix_resample_kernel_mc, mix_resample_pallas, mix_resample_pallas_mc,
)
from srcdsp_tpu.kernels.fftconv_pallas import (  # noqa: F401
    FftConvKernel, FftConvStream, fftconv_pallas, make_fftconv_kernel,
)
from srcdsp_tpu.kernels.bank_pallas import (  # noqa: F401
    make_bank_kernel, make_bank_psk_kernel, phase_major,
)
from srcdsp_tpu.kernels.fsk_fused import (  # noqa: F401
    demod_tail, fsk_demod_fused, make_fsk_mc_kernel,
)
from srcdsp_tpu.kernels.fsk_ctaps import (  # noqa: F401
    fsk_demod_ctaps, make_fsk_ctaps_kernel,
)
from srcdsp_tpu.kernels.mixfir_ctaps import (  # noqa: F401
    CtapsKernel, make_mix_fir_ctaps_kernel, mix_fir_ctaps_pallas,
)
from srcdsp_tpu.kernels.halo_dma import halo_from_left_pallas  # noqa: F401
from srcdsp_tpu.kernels.halo_fused import (  # noqa: F401
    make_halo_fused_kernel, mix_fir_halo_sharded,
)
