"""Tensor-parallel GPT-J decode: the single-chip fused fast path on shards.

TPU-native replacement for the reference's single-host multi-GPU tensor
parallelism (split-buffer weights + per-device partial GEMMs + peer-copy
gathers: ggml_backend_cuda_split_buffer_type /root/reference/src/
ggml-cuda.cu:680-945 and the ggml_cuda_op_mul_mat driver :1360-1660).
Design differences, deliberately TPU-first:

- Weights are sharded **component-wise at quant-block granularity** (the
  analog of get_row_split's tile rounding, ggml-cuda.cu:659-672,580): the
  fused qkvf/of layouts are column/row-PERMUTED once at load so a plain
  GSPMD axis shard hands each device contiguous per-component slices whose
  boundaries are multiples of the 32-element quant block (natpair packs
  natural element pairs, so a 32-aligned element range is a contiguous
  16-byte-row slab — no block is ever split).
- Compute runs under jax.shard_map: every device executes the SAME
  single-chip Pallas kernels (stacked W4A8 GEMV, fused decode attention)
  on its local shard — heads for attention, feature slices for the MLP.
- Communication is ONE jax.lax.psum per layer: GPT-J's parallel attn+FF
  structure (examples/gpt-j/main.cpp:535) sums both row-parallel partials
  into the residual in a single all-reduce of (B, T, E) f32, plus one
  tiled all-gather of the column-sharded lm-head logits per step. The
  reference needs a peer-copy gather per split matmul; here XLA rides ICI.

Alignment requirements (asserted): E % (tp * head_dim) == 0 so heads split
evenly, and padded vocab % (128 * tp) == 0 so each local lm-head shard
keeps the fused kernel's 128-lane alignment (pad_lm_head(multiple=128*tp)).
"""
from __future__ import annotations

from dataclasses import replace
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.common import (KVCache, attention_mask, init_kv_cache,
                             update_kv)
from ..quant.device import QTensor


def _take(qt: QTensor, idx_elems: np.ndarray, axis: str) -> QTensor:
    """Permute a (possibly stacked) natpair QTensor along columns (axis="n",
    element indices = column indices) or contraction rows (axis="k", element
    indices; q byte-row r holds elements 2r/2r+1 so ranges must be 2-aligned,
    scale/bias rows are element//32 so ranges must be 32-aligned)."""
    last = qt.q.ndim - 1
    if axis == "n":
        q = jnp.take(jnp.asarray(qt.q), jnp.asarray(idx_elems), axis=last)
        s = jnp.take(jnp.asarray(qt.scale), jnp.asarray(idx_elems), axis=last)
        b = None if qt.bias is None else \
            jnp.take(jnp.asarray(qt.bias), jnp.asarray(idx_elems), axis=last)
        return replace(qt, q=q, scale=s, bias=b)
    assert axis == "k"
    assert (idx_elems.reshape(-1, 32)[:, 0] % 32 == 0).all(), \
        "k-permutation must move whole 32-element quant blocks"
    rows_q = idx_elems.reshape(-1, 2)[:, 0] // 2     # byte-row indices
    rows_s = idx_elems.reshape(-1, 32)[:, 0] // 32   # scale-row indices
    ax = last - 1
    q = jnp.take(jnp.asarray(qt.q), jnp.asarray(rows_q), axis=ax)
    s = jnp.take(jnp.asarray(qt.scale), jnp.asarray(rows_s), axis=ax)
    b = None if qt.bias is None else \
        jnp.take(jnp.asarray(qt.bias), jnp.asarray(rows_s), axis=ax)
    return replace(qt, q=q, scale=s, bias=b)


def _dev_interleave(segments: list[tuple[int, int]], tp: int) -> np.ndarray:
    """[(start, len), ...] global element segments -> permutation that lays
    out [seg0_dev0, seg1_dev0, ..., seg0_dev1, ...]; every seg len % tp==0."""
    out = []
    for d in range(tp):
        for start, ln in segments:
            assert ln % tp == 0, (start, ln, tp)
            w = ln // tp
            out.append(np.arange(start + d * w, start + (d + 1) * w))
    return np.concatenate(out)


def make_callback_put(mesh: Mesh):
    """A `put` for shard_params_tp/init_cache_tp that materializes each
    global array via jax.make_array_from_callback — every process supplies
    ONLY its addressable shards (the multi-host GGUF loading pattern,
    SURVEY.md §7 step 2: each host reads its slice of the weight file).
    Required when the mesh spans processes; equivalent to device_put on a
    single-process mesh."""
    def put(x, *spec):
        s = NamedSharding(mesh, P(*spec))
        h = np.asarray(x)
        return jax.make_array_from_callback(h.shape, s, lambda idx: h[idx])
    return put


def shard_params_tp(params: dict, mesh: Mesh, cfg, axis: str = "tp",
                    put=None):
    """Place fully-fused stacked GPT-J params (stack_model output with
    qkvf_w + of_w) on the mesh for shard_map TP. Returns a params pytree
    whose QTensor aux (k/n) is LOCAL so the same objects are consistent
    inside the shard_map body, with globally-sharded arrays, plus the
    matching in_specs pytree.

    put(x, *spec) overrides array placement (default: device_put on the
    mesh; pass make_callback_put(mesh) on a process-spanning mesh)."""
    tp = mesh.shape[axis]
    E, H, D = cfg.n_embd, cfg.n_head, cfg.head_dim
    F = 4 * E
    st = params["stack"]
    assert "qkvf_w" in st and "of_w" in st, \
        "TP sharding expects the fully-fused stacked layout " \
        "(GGML_FUSE_FF=1 fuse_qkv + fuse_out + stack_model)"
    assert E % (tp * D) == 0, (E, tp, D)
    # per-device component widths must keep the fused kernels' 128-lane
    # alignment, or local matmuls silently fall back to the XLA path and
    # TP output drifts from single-device by activation-quant noise
    assert E % (tp * 128) == 0, \
        f"E/tp = {E}/{tp} breaks the n%128 fused-kernel gate"

    if put is None:
        def put(x, *spec):
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    def put_qt(qt, *spec):
        return replace(
            qt, q=put(qt.q, *spec), scale=put(qt.scale, *spec),
            bias=None if qt.bias is None else put(qt.bias, *spec))

    out = {"stack": {}}
    specs = {"stack": {}}

    # qkvf_w: columns [q|k|v|ff] -> per-device [q_d|k_d|v_d|ff_d]
    perm_n = _dev_interleave([(0, E), (E, E), (2 * E, E), (3 * E, F)], tp)
    qkvf = _take(st["qkvf_w"], perm_n, "n")
    out["stack"]["qkvf_w"] = replace(
        put_qt(qkvf, None, None, axis), n=qkvf.n // tp)
    specs["stack"]["qkvf_w"] = P(None, None, axis)

    # of_w: contraction rows [attn(E)|ff(4E)] -> [attn_d|ff_d] per device.
    # The K-tile tag must divide the LOCAL k (natpair has no per-tile
    # permutation, so retagging is free; leaving the global tag produced
    # silently-wrong W4A16 tiling when k/tp was not a tag multiple).
    perm_k = _dev_interleave([(0, E), (E, F)], tp)
    of = _take(st["of_w"], perm_k, "k")
    k_loc = of.k // tp
    bk_loc = of.interleaved_bk
    while bk_loc >= 64 and k_loc % bk_loc:
        bk_loc //= 2
    assert k_loc % bk_loc == 0, (k_loc, of.interleaved_bk)
    out["stack"]["of_w"] = replace(
        put_qt(of, None, axis, None), k=k_loc, interleaved_bk=bk_loc)
    specs["stack"]["of_w"] = P(None, axis, None)

    # small stacked arrays
    perm_f = _dev_interleave([(0, F)], tp)
    for k, v in st.items():
        if k in ("qkvf_w", "of_w"):
            continue
        assert not isinstance(v, QTensor), f"unexpected stacked QTensor {k}"
        if k == "fc_in_b":
            out["stack"][k] = put(jnp.asarray(v)[:, perm_f], None, axis)
            specs["stack"][k] = P(None, axis)
        else:
            out["stack"][k] = put(v)
            specs["stack"][k] = P()

    # top level: lm head column-sharded, everything else replicated
    for k, v in params.items():
        if k == "stack":
            continue
        if k == "lmh_w":
            assert v.n % (128 * tp) == 0, \
                (v.n, tp, "pad_lm_head(multiple=128*tp) before sharding")
            out[k] = replace(put_qt(v, None, axis), n=v.n // tp)
            specs[k] = P(None, axis)
        elif k == "lmh_b":
            out[k] = put(jnp.asarray(v), axis)
            specs[k] = P(axis)
        elif isinstance(v, QTensor):
            out[k] = put_qt(v)
            specs[k] = P()
        else:
            out[k] = put(v)
            specs[k] = P()
    return out, specs


def init_cache_tp(cfg, mesh: Mesh, batch: int = 1, n_ctx: int | None = None,
                  dtype=jnp.bfloat16, axis: str = "tp",
                  put=None) -> KVCache:
    """Flat KV arena sharded over heads: global (L, B, T, H*D) with the last
    dim split over tp (head boundaries are D-multiples, so a tp split at
    (H/tp)*D is head-aligned). `heads` metadata is LOCAL so the shard_map
    body's attention sees a consistent local cache. put: see
    shard_params_tp (make_callback_put on process-spanning meshes)."""
    tp = mesh.shape[axis]
    H = getattr(cfg, "n_head_kv", cfg.n_head)     # GQA: cache KV heads
    assert H % tp == 0, (H, tp)
    cache = init_kv_cache(cfg.n_layer, batch, n_ctx or cfg.n_ctx, H,
                          cfg.head_dim, dtype, flat=True)
    spec = P(None, None, None, axis)
    if put is None:
        pp = lambda x: None if x is None else \
            jax.device_put(x, NamedSharding(mesh, spec))
    else:
        pp = lambda x: None if x is None else \
            put(x, None, None, None, axis)
    return KVCache(pp(cache.k), pp(cache.v), pp(cache.ks), pp(cache.vs),
                   heads=H // tp)


def cache_spec(cache: KVCache, axis: str = "tp") -> KVCache:
    """in_specs pytree for a TP-sharded flat KVCache (aux metadata must
    mirror the actual cache for shard_map's pytree-prefix matching)."""
    s = P(None, None, None, axis)
    return KVCache(s, s, None if cache.ks is None else s,
                   None if cache.vs is None else s, heads=cache.heads)


def forward_tp(cfg, params, tokens, positions, cache: KVCache, n_past,
               mesh: Mesh, specs: dict, axis: str = "tp"):
    """TP forward over the stacked fused layout: shard_map body mirrors
    models.gptj._forward_stacked with a single per-layer psum and a tiled
    lm-head all-gather. Returns (full logits, updated sharded cache)."""
    from ..ops.activations import gelu
    from ..ops.flash_attention import attention
    from ..ops.embedding import get_rows
    from ..ops.norms import layer_norm
    from ..ops.rope import rope
    from ..ops.decode_attention import (decode_attention_stacked,
                                        decode_attention_update_stacked)
    from ..ops.qmatmul import qmatmul, qmatmul_stacked
    from ..models.common import read_kv

    tp = mesh.shape[axis]
    E, H, D = cfg.n_embd, cfg.n_head, cfg.head_dim
    E_loc, H_loc = E // tp, H // tp
    B, T = tokens.shape
    from ..ops.decode_attention import select_decode_path
    # per-device caches are flat; cells-mode does not apply under TP
    class _FlatProbe:
        flat = True
    path = select_decode_path(T=T, B=B, D=D, cells=None, cache=_FlatProbe)
    use_kernel = path in ("fused", "kernel")
    fused_upd = path == "fused"

    def body(params, tokens, positions, cache, n_past):
        st = params["stack"]
        qts = {k: v for k, v in st.items() if isinstance(v, QTensor)}
        small = {k: v for k, v in st.items() if not isinstance(v, QTensor)}
        x = get_rows(params["wte"], tokens, dtype=jnp.float32)
        mask = attention_mask(positions, cache.n_ctx, n_past)

        def layer(carry, xs):
            x, cache = carry
            li, sm = xs
            cur = layer_norm(x, sm["ln_1_g"], sm["ln_1_b"])
            qkvf = qmatmul_stacked(cur, qts["qkvf_w"], li)
            qkv = qkvf[..., :3 * E_loc].reshape(B, T, 3, H_loc, D)
            q, kk, vv = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            ff_pre = qkvf[..., 3 * E_loc:]
            q = rope(q, positions, n_dims=cfg.n_rot, mode=0)
            kk = rope(kk, positions, n_dims=cfg.n_rot, mode=0)
            if fused_upd:
                attn, cache2 = decode_attention_update_stacked(
                    cache, li, q, kk, vv, n_past, mask)
            elif use_kernel:
                cache2 = update_kv(cache, li, kk, vv, n_past)
                attn = decode_attention_stacked(cache2, li, q, mask)
            else:
                cache2 = update_kv(cache, li, kk, vv, n_past)
                attn = attention(q, *read_kv(cache2, li, dtype=q.dtype),
                                 mask, out_dtype=jnp.float32)
            attn = attn.reshape(B, T, E_loc)
            ff = gelu(ff_pre + sm["fc_in_b"])
            y = qmatmul_stacked(jnp.concatenate([attn, ff], axis=-1),
                                qts["of_w"], li)
            y = jax.lax.psum(y, axis)              # ONE all-reduce per layer
            x = x + y + sm["fc_out_b"]
            return (x, cache2), None

        lis = jnp.arange(cfg.n_layer, dtype=jnp.int32)
        from ..models.common import scan_layers
        (x, cache), _ = scan_layers(layer, (x, cache), lis, small)
        x = layer_norm(x, params["ln_f_g"], params["ln_f_b"])
        logits = qmatmul(x, params["lmh_w"], out_dtype=jnp.float32) \
            + params["lmh_b"]
        logits = jax.lax.all_gather(logits, axis, axis=logits.ndim - 1,
                                    tiled=True)
        return logits, cache

    cspec = cache_spec(cache, axis)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(specs, P(), P(), cspec, P()),
        out_specs=(P(), cspec),
        check_vma=False)
    logits, cache = fn(params, tokens, positions, cache,
                       jnp.asarray(n_past, jnp.int32))
    if params["lmh_w"].n * tp > cfg.n_vocab:       # pad_lm_head columns
        logits = logits[..., :cfg.n_vocab]
    return logits, cache


def collective_volume_model(cfg, tp: int, *, batch: int = 1,
                            hbm_gbps: float = 748.0,
                            ici_gbps: float = 45.0) -> dict:
    """Predicted TP scaling for quantized decode (the stand-in for the
    multi-host >=80% gate that one chip cannot measure; BASELINE.md).

    Per token: weights streamed per device = image/tp (HBM-bound);
    collectives = n_layer ring all-reduces of (B, E) f32 partials
    (2*(tp-1)/tp of the payload crosses ICI per device) + one tiled
    all-gather of the (B, V/tp) local logits."""
    E, L, V = cfg.n_embd, cfg.n_layer, cfg.n_vocab
    layer_bytes = (3 * E + 4 * E) * E / 2 + (7 * E * E // 32) * 4 \
        + (E + 4 * E) * E / 2 + (5 * E * E // 32) * 4
    image = L * layer_bytes + V * E / 2 * 2        # + wte/lmh nib4
    ar_bytes = L * batch * E * 4 * 2 * (tp - 1) / tp
    ag_bytes = batch * (V / tp) * 4 * (tp - 1)
    t_hbm = image / tp / (hbm_gbps * 1e9)
    t_ici = (ar_bytes + ag_bytes) / (ici_gbps * 1e9)
    t1 = image / (hbm_gbps * 1e9)
    eff = t1 / tp / (t_hbm + t_ici)
    return {"tp": tp, "image_bytes": int(image),
            "per_device_bytes": int(image / tp),
            "allreduce_bytes_per_tok": int(ar_bytes),
            "allgather_bytes_per_tok": int(ag_bytes),
            "t_step_ms": (t_hbm + t_ici) * 1e3,
            "predicted_scaling_efficiency": eff}


# ---- ring prefill: tp × sp long-context prefill (SURVEY §5) ----


def init_cache_ringsp(cfg, mesh: Mesh, batch: int = 1,
                      n_ctx: int | None = None, dtype=jnp.bfloat16,
                      tp_axis: str = "tp", sp_axis: str = "sp") -> KVCache:
    """Flat KV arena for the ring-prefill path: the sequence axis sharded
    over `sp` (each device owns a contiguous chunk of the global context,
    stored at LOCAL offset 0 — global position = shard_index * (n_ctx/sp)
    + local index) and heads over `tp`. The full-context cache never
    exists on any one device, so the reachable context is sp× one chip's
    KV budget — the long-context capability the reference lacks
    (SURVEY.md §5; its n_ctx is bounded by one device's preallocation,
    /root/reference/examples/gpt-j/main.cpp:560)."""
    sp, tp = mesh.shape[sp_axis], mesh.shape[tp_axis]
    H = getattr(cfg, "n_head_kv", cfg.n_head)
    n_ctx = n_ctx or cfg.n_ctx
    assert n_ctx % sp == 0 and H % tp == 0, (n_ctx, sp, H, tp)
    cache = init_kv_cache(cfg.n_layer, batch, n_ctx, H, cfg.head_dim,
                          dtype, flat=True)
    spec = P(None, None, sp_axis, tp_axis)
    put = lambda x: None if x is None else \
        jax.device_put(x, NamedSharding(mesh, spec))
    return KVCache(put(cache.k), put(cache.v), put(cache.ks), put(cache.vs),
                   heads=H // tp)


def forward_ring_prefill(cfg, params, tokens, positions, cache: KVCache,
                         mesh: Mesh, specs: dict, tp_axis: str = "tp",
                         sp_axis: str = "sp"):
    """Long-context GPT-J prefill over a (tp, sp) mesh: weights sharded
    exactly as forward_tp (shard_params_tp — heads/features over tp),
    the SEQUENCE sharded over sp. Each device computes q/k/v for its own
    token chunk, writes its KV-arena shard in place, and attends over the
    full global context by rotating KV chunks around the sp ring
    (ring_attention_local) with absolute-position causal masks — exact
    attention, one psum per layer over tp, zero sp collectives outside
    attention (MLP and norms are position-local).

    tokens/positions: (B, T) global, sharded P(None, sp); T must fill the
    arena chunks (T == cache n_ctx). Returns (logits sharded P(None, sp,
    None), updated sharded cache). The last token's logits live on the
    last sp shard; jnp indexing assembles them transparently."""
    from ..ops.activations import gelu
    from ..ops.embedding import get_rows
    from ..ops.norms import layer_norm
    from ..ops.rope import rope
    from ..ops.qmatmul import qmatmul, qmatmul_stacked
    from ..models.common import scan_layers
    from .ring_attention import ring_attention_local

    tp, sp = mesh.shape[tp_axis], mesh.shape[sp_axis]
    E, H, D = cfg.n_embd, cfg.n_head, cfg.head_dim
    E_loc, H_loc = E // tp, H // tp
    B, T = tokens.shape
    assert T % sp == 0, (T, sp)
    T_loc = T // sp
    assert T == cache.k.shape[2], \
        ("ring prefill fills the arena exactly: global T must equal the "
         "cache n_ctx", T, cache.k.shape[2])

    def body(params, tokens, positions, cache):
        st = params["stack"]
        qts = {k: v for k, v in st.items() if isinstance(v, QTensor)}
        small = {k: v for k, v in st.items() if not isinstance(v, QTensor)}
        x = get_rows(params["wte"], tokens, dtype=jnp.float32)

        def layer(carry, xs):
            x, cache = carry
            li, sm = xs
            cur = layer_norm(x, sm["ln_1_g"], sm["ln_1_b"])
            qkvf = qmatmul_stacked(cur, qts["qkvf_w"], li)
            qkv = qkvf[..., :3 * E_loc].reshape(B, T_loc, 3, H_loc, D)
            q, kk, vv = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            ff_pre = qkvf[..., 3 * E_loc:]
            q = rope(q, positions, n_dims=cfg.n_rot, mode=0)
            kk = rope(kk, positions, n_dims=cfg.n_rot, mode=0)
            # local chunk lands at LOCAL offset 0 of this device's arena
            # shard (global offset = shard_index * T_loc)
            cache2 = update_kv(cache, li, kk, vv, 0)
            attn = ring_attention_local(
                q, kk, vv, positions, positions, axis=sp_axis, n_dev=sp,
                causal=True)
            attn = attn.reshape(B, T_loc, E_loc)
            ff = gelu(ff_pre + sm["fc_in_b"])
            y = qmatmul_stacked(jnp.concatenate([attn, ff], axis=-1),
                                qts["of_w"], li)
            y = jax.lax.psum(y, tp_axis)           # ONE all-reduce per layer
            x = x + y + sm["fc_out_b"]
            return (x, cache2), None

        lis = jnp.arange(cfg.n_layer, dtype=jnp.int32)
        (x, cache), _ = scan_layers(layer, (x, cache), lis, small)
        x = layer_norm(x, params["ln_f_g"], params["ln_f_b"])
        logits = qmatmul(x, params["lmh_w"], out_dtype=jnp.float32) \
            + params["lmh_b"]
        logits = jax.lax.all_gather(logits, tp_axis, axis=logits.ndim - 1,
                                    tiled=True)
        return logits, cache

    cs = P(None, None, sp_axis, tp_axis)
    cspec = KVCache(cs, cs, None if cache.ks is None else cs,
                    None if cache.vs is None else cs, heads=cache.heads)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(specs, P(None, sp_axis), P(None, sp_axis), cspec),
        out_specs=(P(None, sp_axis, None), cspec),
        check_vma=False)
    logits, cache = fn(params, tokens, positions, cache)
    if params["lmh_w"].n * tp > cfg.n_vocab:       # pad_lm_head columns
        logits = logits[..., :cfg.n_vocab]
    return logits, cache


# ---- LLaMA-family TP (GQA, sequential attn->mlp residuals) ----


def shard_params_tp_llama(params: dict, mesh: Mesh, cfg, axis: str = "tp",
                          put=None):
    """TP placement for the fully-fused stacked LLaMA layout (fuse_qkv +
    fuse_gate_up + stack_model): qkv/gu column-sharded component-wise,
    o/down row-sharded (plain contiguous shards — single-segment rows need
    no permutation), norms replicated. The lm head (`output`) column-shards
    when present; a tied embedding head stays replicated (each device
    computes full logits from the replicated embedding). Returns
    (params, in_specs)."""
    tp = mesh.shape[axis]
    E, H, Hkv, D = cfg.n_embd, cfg.n_head, cfg.n_head_kv, cfg.head_dim
    KV = Hkv * D
    st = params["stack"]
    assert "qkv_w" in st and "gu_w" in st, \
        "llama TP expects fuse_qkv + fuse_gate_up + stack_model"
    F = st["gu_w"].n // 2
    assert F == st["down_w"].k, \
        ("TP shards gate/up and down complementarily; re-fuse with "
         "fuse_gate_up(params, pad_multiple=1) — the single-chip decode "
         "pad is incompatible with component-wise sharding", F,
         st["down_w"].k)
    assert E % (tp * 128) == 0 and KV % (tp * D) == 0 and F % (tp * 128) == 0

    if put is None:
        def put(x, *spec):
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    def put_qt(qt, *spec):
        return replace(
            qt, q=put(qt.q, *spec), scale=put(qt.scale, *spec),
            bias=None if qt.bias is None else put(qt.bias, *spec))

    def fit_bk(qt, k_loc):
        bk = qt.interleaved_bk
        while bk >= 64 and k_loc % bk:
            bk //= 2
        assert k_loc % bk == 0, (k_loc, qt.interleaved_bk)
        return bk

    out = {"stack": {}}
    specs = {"stack": {}}

    perm_qkv = _dev_interleave([(0, E), (E, KV), (E + KV, KV)], tp)
    qkv = _take(st["qkv_w"], perm_qkv, "n")
    out["stack"]["qkv_w"] = replace(put_qt(qkv, None, None, axis),
                                    n=qkv.n // tp)
    specs["stack"]["qkv_w"] = P(None, None, axis)

    perm_gu = _dev_interleave([(0, F), (F, F)], tp)
    gu = _take(st["gu_w"], perm_gu, "n")
    out["stack"]["gu_w"] = replace(put_qt(gu, None, None, axis),
                                   n=gu.n // tp)
    specs["stack"]["gu_w"] = P(None, None, axis)

    for name in ("o_w", "down_w"):
        qt = st[name]
        k_loc = qt.k // tp
        out["stack"][name] = replace(
            put_qt(qt, None, axis, None), k=k_loc,
            interleaved_bk=fit_bk(qt, k_loc))
        specs["stack"][name] = P(None, axis, None)

    for k, v in st.items():
        if k in ("qkv_w", "gu_w", "o_w", "down_w"):
            continue
        assert not isinstance(v, QTensor), f"unexpected stacked QTensor {k}"
        out["stack"][k] = put(v)
        specs["stack"][k] = P()

    for k, v in params.items():
        if k == "stack":
            continue
        if k == "output" and isinstance(v, QTensor):
            assert v.n % (128 * tp) == 0, (v.n, tp)
            out[k] = replace(put_qt(v, None, axis), n=v.n // tp)
            specs[k] = P(None, axis)
        elif isinstance(v, QTensor):
            out[k] = put_qt(v)
            specs[k] = P()
        elif v is None:
            out[k] = None
            specs[k] = None
        else:
            out[k] = put(v)
            specs[k] = P()
    return out, specs


def forward_tp_llama(cfg, params, tokens, positions, cache: KVCache, n_past,
                     mesh: Mesh, specs: dict, axis: str = "tp"):
    """shard_map TP forward for LLaMA: same per-shard kernels as the
    single-chip stacked path, TWO psums per layer (sequential attn and mlp
    residuals — LLaMA has no parallel structure to merge them, unlike
    GPT-J's single all-reduce)."""
    from ..ops.activations import silu
    from ..ops.flash_attention import attention
    from ..ops.embedding import get_rows
    from ..ops.norms import rms_norm
    from ..ops.rope import rope
    from ..ops.decode_attention import (decode_attention_stacked,
                                        decode_attention_update_stacked)
    from ..ops.qmatmul import qmatmul, qmatmul_stacked
    from ..models.common import read_kv

    tp = mesh.shape[axis]
    E, H, Hkv, D = cfg.n_embd, cfg.n_head, cfg.n_head_kv, cfg.head_dim
    E_loc, H_loc, Hkv_loc = E // tp, H // tp, Hkv // tp
    KV_loc = Hkv_loc * D
    B, T = tokens.shape
    from ..ops.decode_attention import select_decode_path
    # per-device caches are flat; cells-mode does not apply under TP
    class _FlatProbe:
        flat = True
    path = select_decode_path(T=T, B=B, D=D, cells=None, cache=_FlatProbe)
    use_kernel = path in ("fused", "kernel")
    fused_upd = path == "fused"
    rope_args = dict(n_dims=D, mode=cfg.rope_mode, freq_base=cfg.rope_base,
                     freq_scale=cfg.rope_scale)

    def body(params, tokens, positions, cache, n_past):
        st = params["stack"]
        qts = {k: v for k, v in st.items() if isinstance(v, QTensor)}
        small = {k: v for k, v in st.items() if not isinstance(v, QTensor)}
        x = get_rows(params["tok_embd"], tokens, dtype=jnp.float32)
        from ..models.common import attention_mask
        mask = attention_mask(positions, cache.n_ctx, n_past)

        def layer(carry, xs):
            x, cache = carry
            li, sm = xs
            cur = rms_norm(x, sm["attn_norm"], eps=cfg.rms_eps)
            qkv = qmatmul_stacked(cur, qts["qkv_w"], li)
            q = qkv[..., :E_loc].reshape(B, T, H_loc, D)
            kk = qkv[..., E_loc:E_loc + KV_loc].reshape(B, T, Hkv_loc, D)
            vv = qkv[..., E_loc + KV_loc:].reshape(B, T, Hkv_loc, D)
            q = rope(q, positions, **rope_args)
            kk = rope(kk, positions, **rope_args)
            if fused_upd:
                attn, cache2 = decode_attention_update_stacked(
                    cache, li, q, kk, vv, n_past, mask)
            elif use_kernel:
                cache2 = update_kv(cache, li, kk, vv, n_past)
                attn = decode_attention_stacked(cache2, li, q, mask)
            else:
                cache2 = update_kv(cache, li, kk, vv, n_past)
                attn = attention(q, *read_kv(cache2, li, dtype=q.dtype),
                                 mask, out_dtype=jnp.float32)
            y = qmatmul_stacked(attn.reshape(B, T, E_loc), qts["o_w"], li)
            x = x + jax.lax.psum(y, axis)
            cur = rms_norm(x, sm["ffn_norm"], eps=cfg.rms_eps)
            gu = qmatmul_stacked(cur, qts["gu_w"], li)
            F_loc = gu.shape[-1] // 2
            ff = silu(gu[..., :F_loc]) * gu[..., F_loc:]
            y = qmatmul_stacked(ff, qts["down_w"], li)
            x = x + jax.lax.psum(y, axis)
            return (x, cache2), None

        lis = jnp.arange(cfg.n_layer, dtype=jnp.int32)
        from ..models.common import scan_layers
        (x, cache), _ = scan_layers(layer, (x, cache), lis, small)
        x = rms_norm(x, params["out_norm"], eps=cfg.rms_eps)
        head = params["output"] if params.get("output") is not None \
            else params["tok_embd"]
        logits = qmatmul(x, head, out_dtype=jnp.float32)
        if params.get("output") is not None:
            logits = jax.lax.all_gather(logits, axis, axis=logits.ndim - 1,
                                        tiled=True)
        return logits, cache

    cspec = cache_spec(cache, axis)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(specs, P(), P(), cspec, P()),
        out_specs=(P(), cspec),
        check_vma=False)
    logits, cache = fn(params, tokens, positions, cache,
                       jnp.asarray(n_past, jnp.int32))
    head_n = (params["output"].n * tp if params.get("output") is not None
              else params["tok_embd"].n)
    if head_n > cfg.n_vocab:
        logits = logits[..., :cfg.n_vocab]
    return logits, cache
