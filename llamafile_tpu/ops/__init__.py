"""Compute kernels (Pallas) and device-format repacking (llamafile L2 analog).

Import functions from the submodules directly (`from llamafile_tpu.ops.qmatmul
import qmatmul`); this package intentionally re-exports only names that don't
collide with submodule names, so `llamafile_tpu.ops.repack` stays a module.
"""
from .repack import QTensor, repack_numpy, dequant_qtensor_numpy
from .repack import repack as load_qtensor
from .qmatmul import qmatmul_fallback

__all__ = ["QTensor", "repack_numpy", "dequant_qtensor_numpy", "load_qtensor",
           "qmatmul_fallback"]
