"""Pallas TPU kernels: the compute core of kivi-tpu.

Replaces the reference's CUDA/Triton kernel package `quant/`
(`gemv_cuda.cu`, `new_pack.py`, `matmul.py`) with TPU-native Pallas
kernels.  On non-TPU backends every kernel runs in interpreter mode so
the full test suite works on CPU.
"""

from kivi_tpu.kernels.qk_pv import qk_dequant_matmul, pv_dequant_matmul
from kivi_tpu.kernels.flash import flash_attention
from kivi_tpu.kernels.flash_extend import (flash_extend_attention,
                                           flash_extend_qhist)
from kivi_tpu.kernels.fp_decode import fp_decode_attention_kernel
from kivi_tpu.kernels.fused_decode import fused_decode_attention
from kivi_tpu.kernels.quant_pack import quantize_pack_k, quantize_pack_v

__all__ = [
    "qk_dequant_matmul",
    "pv_dequant_matmul",
    "flash_attention",
    "flash_extend_qhist",
    "fp_decode_attention_kernel",
    "fused_decode_attention",
    "quantize_pack_k",
    "quantize_pack_v",
]
