"""Sharding rules for quantized params.

The analog of the reference's CUDA split-buffer tensor parallelism
(ggml_backend_cuda_split_buffer_type, ggml-cuda.cu:680-945, row ranges rounded
to quant-block granularity at :580) — but expressed as GSPMD shardings on the
packed arrays rather than explicit per-device partial GEMMs + peer copies.

Quant-block alignment: a nib4 QTensor packs 16 byte-rows per 32-element block,
so a "row" (contraction) shard over tp devices is valid iff (K/2) % (16*tp)
== 0, which `shard_qtensor` asserts. Scales/biases shard with their groups.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..quant.device import QTensor

COL = "col"          # shard output features (N): column-parallel
ROW = "row"          # shard contraction dim (K): row-parallel (XLA all-reduces)
REP = "replicate"


def _put(x, mesh, spec):
    if x is None:
        return None
    return jax.device_put(x, NamedSharding(mesh, spec))


def shard_qtensor(qt: QTensor, mesh: Mesh, how: str, axis: str = "tp") -> QTensor:
    """Place a QTensor on the mesh with column/row/replicated layout."""
    tp = mesh.shape[axis]
    if how == COL:
        assert qt.n % tp == 0, (qt.n, tp)
        qspec = P(None, axis)
    elif how == ROW:
        rows = qt.q.shape[0]
        blocks_rows = 16 if qt.kind == "nib4" else 32
        assert rows % tp == 0 and (rows // tp) % blocks_rows == 0 or qt.kind == "dense", \
            f"row shard misaligned to quant blocks: {rows} / {tp}"
        qspec = P(axis, None)
    elif how == REP:
        qspec = P()
    else:
        raise ValueError(how)

    sspec = qspec if how != ROW else P(axis, None)
    return QTensor(
        kind=qt.kind,
        q=_put(qt.q, mesh, qspec),
        scale=_put(qt.scale, mesh, sspec if qt.kind != "dense" else P()),
        bias=_put(qt.bias, mesh, sspec if qt.kind != "dense" else P()),
        k=qt.k, n=qt.n, ggml_type=qt.ggml_type, zero=qt.zero,
        interleaved_bk=qt.interleaved_bk,
    )


def shard_array(x, mesh: Mesh, *spec):
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


# per-model-family weight sharding maps: name-suffix -> COL/ROW/REP
GPTJ_RULES = {
    "wte": COL, "lmh_w": COL,
    "q_w": COL, "k_w": COL, "v_w": COL, "o_w": ROW,
    "fc_in_w": COL, "fc_out_w": ROW,
    "qkv_w": COL, "qkvf_w": COL,     # fuse_qkv outputs (feature-parallel)
}
LLAMA_RULES = {
    "tok_embd": COL, "output": COL,
    "q_w": COL, "k_w": COL, "v_w": COL, "o_w": ROW,
    "gate_w": COL, "up_w": COL, "down_w": ROW,
}
GPT2_RULES = {
    "wte": COL, "lm_head": COL,
    "attn_w": COL, "proj_w": ROW, "fc_w": COL, "out_w": ROW,
}


def shard_params(params, mesh: Mesh, rules: dict):
    """Apply a rules map to a model params pytree. QTensor leaves whose dict
    key is in `rules` get that placement; every other leaf is replicated.
    Biases of column-parallel projections are sharded with the features."""
    col_bias = {  # bias arrays that live on a column-sharded feature dim
        "attn_b": "attn_w", "fc_b": "fc_w", "fc_in_b": "fc_in_w",
        "lmh_b": "lmh_w",
    }

    def place(d):
        out = {}
        for k, v in d.items():
            if isinstance(v, list):
                out[k] = [place(x) for x in v]
            elif isinstance(v, QTensor):
                out[k] = shard_qtensor(v, mesh, rules.get(k, REP))
            elif v is None:
                out[k] = None
            elif k in col_bias and rules.get(col_bias[k]) == COL:
                out[k] = shard_array(v, mesh, "tp")
            else:
                out[k] = jax.device_put(v, NamedSharding(mesh, P()))
        return out

    return place(params)


def shard_kv_cache(cache, mesh: Mesh):
    """KV cache (L, B, C, H, D): batch over dp, heads over tp."""
    from ..models.common import KVCache
    spec = P(None, "dp", None, "tp", None)
    return KVCache(shard_array(cache.k, mesh, *spec),
                   shard_array(cache.v, mesh, *spec))


def constrain_heads(x, axis: str = "tp"):
    """Pin a (..., H, D) activation's head axis to the tp mesh axis when an
    abstract mesh carrying that axis is active (jax.sharding.use_abstract_mesh
    or `with mesh:` via set_mesh); identity otherwise, so model code stays
    mesh-agnostic.

    Why: a column-parallel QKV projection leaves (B, T, 3EH·D) sharded on the
    LAST dim; without an anchor GSPMD may push that sharding through the
    (…, H, D) reshape onto D (or worse, the rope pair-split's trailing 2),
    then "involuntarily fully rematerialize" to re-partition — a full
    replication per layer (MULTICHIP_r03 tail warnings). Head-sharding is the
    consistent choice: tp ≤ H divides the head axis, and (…, H/tp, D) per
    device is byte-identical to (…, (H·D)/tp) per device, so the constraint
    is layout-free."""
    am = jax.sharding.get_abstract_mesh()
    names = getattr(am, "axis_names", ())
    if axis in names and am.shape[axis] > 1 \
            and x.shape[-2] % am.shape[axis] == 0:
        # keep the batch (leading) dim on dp when present — constraining it
        # to None would DEMAND replication and force the very all-gather
        # this anchor exists to avoid
        lead = "dp" if ("dp" in names and am.shape["dp"] > 1
                        and x.shape[0] % am.shape["dp"] == 0) else None
        spec = P(lead, *([None] * (x.ndim - 3)), axis, None)
        return jax.lax.with_sharding_constraint(x, spec)
    return x
