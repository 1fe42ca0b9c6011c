"""Op set (ggml's ~70-op inventory re-expressed for XLA/Pallas; SURVEY §2.1).

Hot path: qmatmul (fused Pallas W4 / XLA dequant-fuse) and flash_attention.
Everything else is a thin, fusable XLA expression in its own module:
activations, norms, softmax (soft_max_ext), rope (YaRN/xPos/GLM), conv/pool,
ssm (Mamba), moe (mul_mat_id), tensor_ops (argsort/win_part/rel_pos/...),
embedding (get_rows), sampling.
"""
from .qmatmul import dequantize_xla, qmatmul, set_activation_observer
from .pallas_qmm import (params_repack_device, qmatmul_pallas,
                         repack_interleaved, repack_interleaved_device)
from .flash_attention import attention, flash_attention
from .attention import attention_xla, causal_mask
from .embedding import get_rows
from .rope import rope
from .softmax import soft_max_ext
from .moe import moe_ffn, mul_mat_id, mul_mat_id_grouped
from .ssm import ssm_conv, ssm_scan

__all__ = [
    "qmatmul", "dequantize_xla", "set_activation_observer",
    "qmatmul_pallas", "repack_interleaved", "repack_interleaved_device",
    "params_repack_device", "attention", "flash_attention", "attention_xla",
    "causal_mask", "get_rows", "rope", "soft_max_ext", "mul_mat_id",
    "mul_mat_id_grouped", "moe_ffn", "ssm_conv", "ssm_scan",
]
