"""Pallas TPU kernels (SURVEY.md §1.2 T1): the hand-scheduled hot path."""

from srcdsp_tpu.kernels.mixfir import (  # noqa: F401
    MixFirKernel, make_mix_fir_kernel,
)
