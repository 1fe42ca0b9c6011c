"""Row gather (ggml_get_rows analog, incl. from quantized tensors).

The reference dequantizes gathered rows on the fly (ggml_compute_forward
_get_rows_q). On TPU the embedding table stays quantized in HBM and the
gather + dequant happen fused in XLA.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..quant.device import QTensor


def get_rows(qt: QTensor, ids, dtype=jnp.bfloat16):
    """Gather rows of a (possibly quantized) embedding table.

    qt: QTensor with k = row length (embedding dim), n = vocab rows.
    ids: int array (...,) of row indices -> (..., k).
    """
    if qt.kind == "dense":
        # qt.q is (K, N) = (embd, vocab): gather columns
        return jnp.asarray(qt.q).T[ids].astype(dtype)

    scale = jnp.asarray(qt.scale)
    n_groups = scale.shape[0]
    group = qt.k // n_groups

    if qt.kind == "nib4":
        qs = jnp.asarray(qt.q)                            # (K/2, N)
        if qt.q4_layout == 3:
            # natural-pair layout: gather packed columns, then unpack
            cols = qs.T[ids]                              # (..., K/2)
            lo = ((cols & 0x0F) ^ 8).astype(jnp.int8) - 8
            hi = ((cols >> 4) ^ 8).astype(jnp.int8) - 8
            q = jnp.stack([lo, hi], axis=-1).reshape(*cols.shape[:-1], qt.k)
        elif qt.q4_layout == 1:
            from .qmatmul import _unpack_rowpair
            q = _unpack_rowpair(qs, qt).T[ids]            # (..., K) signed
        else:
            if qt.interleaved_bk:
                # undo the fused-kernel tile interleave (ops/pallas_qmm.py)
                nb = qt.interleaved_bk // 32
                qs = (qs.reshape(qt.k // qt.interleaved_bk, 16, nb, qt.n)
                      .transpose(0, 2, 1, 3).reshape(qt.k // 2, qt.n))
            cols = qs.T[ids]                              # (..., K/2)
            g = cols.reshape(*cols.shape[:-1], qt.k // 32, 16)
            lo = (g & 0x0F).astype(jnp.int8) - qt.zero
            hi = (g >> 4).astype(jnp.int8) - qt.zero
            q = jnp.concatenate([lo, hi], axis=-1).reshape(*cols.shape[:-1], qt.k)
    else:
        q = jnp.asarray(qt.q)
        if qt.kind == "int8" and qt.q4_layout == 2:
            # undo the u-order row permutation (repack_int8_rows_device)
            bk, grp = qt.interleaved_bk, qt.k // n_groups
            q = (q.reshape(qt.k // bk, grp, bk // grp, qt.n)
                 .transpose(0, 2, 1, 3).reshape(qt.k, qt.n))
        q = q.T[ids]                                      # (..., K)

    s = scale.T[ids]                                      # (..., n_groups)
    qg = q.reshape(*q.shape[:-1], n_groups, group).astype(dtype)
    w = qg * s[..., None].astype(dtype)
    if qt.bias is not None:
        b = jnp.asarray(qt.bias).T[ids]
        w = w + b[..., None].astype(dtype)
    return w.reshape(*q.shape[:-1], qt.k)
