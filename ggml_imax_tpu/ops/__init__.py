from .qmatmul import dequantize_xla, qmatmul
from .pallas_qmm import qmatmul_pallas, repack_interleaved

__all__ = ["qmatmul", "dequantize_xla", "qmatmul_pallas", "repack_interleaved"]
