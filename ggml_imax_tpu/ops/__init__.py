"""Op set (ggml's ~70-op inventory re-expressed for XLA/Pallas; SURVEY §2.1).

Hot path: qmatmul (fused Pallas W4 / XLA dequant-fuse) and flash attention.
Modules: activations, norms, softmax (soft_max_ext), rope (YaRN/xPos/GLM),
conv/pool, ssm (Mamba), moe (mul_mat_id), tensor_ops (argsort/win_part/...),
embedding (get_rows), sampling, attention (XLA reference),
flash_attention (Pallas + dispatcher), pallas_qmm (fused W4 kernels).

NB: only names that don't collide with submodule names are re-exported at
package level (e.g. use `ops.rope.rope`, `ops.flash_attention.attention`).
"""
from .qmatmul import dequantize_xla, qmatmul, set_activation_observer
from .pallas_qmm import (params_repack_device, qmatmul_pallas,
                         repack_interleaved, repack_interleaved_device,
                         repack_rowpair_device)
from .embedding import get_rows
from .softmax import soft_max_ext
from .moe import moe_ffn, mul_mat_id, mul_mat_id_grouped
from .ssm import ssm_conv, ssm_scan
# import submodules so `ops.rope`, `ops.attention`, ... resolve as modules
from . import (activations, attention, conv, flash_attention, norms, rope,
               sampling, softmax, tensor_ops)

__all__ = [
    "qmatmul", "dequantize_xla", "set_activation_observer",
    "qmatmul_pallas", "repack_interleaved", "repack_interleaved_device",
    "repack_rowpair_device", "params_repack_device", "get_rows",
    "soft_max_ext", "mul_mat_id", "mul_mat_id_grouped", "moe_ffn",
    "ssm_conv", "ssm_scan",
]
