"""Pallas TPU kernels (SURVEY.md §1.2 T1): the hand-scheduled hot path."""

from srcdsp_tpu.kernels.mixfir import (  # noqa: F401
    MixFirKernel, make_mix_fir_kernel, make_mix_fir_kernel_mc,
    mix_fir_decim_pallas, mix_fir_decim_pallas_mc,
)
from srcdsp_tpu.kernels.resample_pallas import (  # noqa: F401
    make_mix_resample_kernel, mix_resample_pallas,
)
from srcdsp_tpu.kernels.halo_dma import halo_from_left_pallas  # noqa: F401
