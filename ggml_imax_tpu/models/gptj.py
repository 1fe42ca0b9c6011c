"""GPT-J — the reference's headline benchmark model (examples/gpt-j/main.cpp:
loader :96-352, graph :421-589). Parallel attention+MLP residual, partial
rotary (n_rot) in ggml's normal mode, untied LM head with bias.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..io.legacy_bin import read_legacy_bin
from ..ops.activations import gelu
from ..ops.flash_attention import attention
from ..ops.embedding import get_rows
from ..ops.norms import layer_norm
from ..parallel.sharding import constrain_heads
from ..ops.qmatmul import qmatmul
from ..ops.rope import rope, rope_split
from ..quant.device import to_device_format, quantize_for_device
from ..quant.formats import GGMLType
from ..tokenizer.bpe import GreedyBPETokenizer
from .common import (KVCache, attention_mask, init_kv_cache, read_kv,
                     update_kv,
                     update_kv_cells)

HPARAM_NAMES = ["n_vocab", "n_ctx", "n_embd", "n_head", "n_layer", "n_rot", "ftype"]


@dataclass(frozen=True)
class GPTJConfig:
    n_vocab: int = 50400
    n_ctx: int = 2048
    n_embd: int = 4096
    n_head: int = 16
    n_layer: int = 28
    n_rot: int = 64

    @property
    def head_dim(self):
        return self.n_embd // self.n_head


def load_legacy(path: str | Path):
    f = read_legacy_bin(path, HPARAM_NAMES)
    cfg = GPTJConfig(f.hparams["n_vocab"], f.hparams["n_ctx"], f.hparams["n_embd"],
                     f.hparams["n_head"], f.hparams["n_layer"], f.hparams["n_rot"])
    tok = GreedyBPETokenizer(f.vocab)

    def dev(name):
        t = f.tensors[name]
        return to_device_format(t.data, t.ggml_type, t.shape)

    def vec(name):
        t = f.tensors[name]
        from ..quant import codecs
        return jnp.asarray(codecs.dequantize(t.data, t.ggml_type,
                                             shape=tuple(reversed(t.shape))))

    params = {
        "wte": dev("transformer.wte.weight"),
        "ln_f_g": vec("transformer.ln_f.weight"), "ln_f_b": vec("transformer.ln_f.bias"),
        "lmh_w": dev("lm_head.weight"), "lmh_b": vec("lm_head.bias"),
        "layers": [],
    }
    for i in range(cfg.n_layer):
        p = f"transformer.h.{i}"
        params["layers"].append({
            "ln_1_g": vec(f"{p}.ln_1.weight"), "ln_1_b": vec(f"{p}.ln_1.bias"),
            "q_w": dev(f"{p}.attn.q_proj.weight"),
            "k_w": dev(f"{p}.attn.k_proj.weight"),
            "v_w": dev(f"{p}.attn.v_proj.weight"),
            "o_w": dev(f"{p}.attn.out_proj.weight"),
            "fc_in_w": dev(f"{p}.mlp.fc_in.weight"), "fc_in_b": vec(f"{p}.mlp.fc_in.bias"),
            "fc_out_w": dev(f"{p}.mlp.fc_out.weight"), "fc_out_b": vec(f"{p}.mlp.fc_out.bias"),
        })
    return cfg, params, tok


def synthetic_params(cfg: GPTJConfig, wtype: GGMLType = GGMLType.Q4_0, seed: int = 0,
                     scale: float = 0.02, fast: bool = True):
    """Random weights at full model size — used by benchmarks when no
    checkpoint is available (zero network egress). With fast=True, device-
    format tensors are fabricated directly (random packed nibbles + scales
    statistically matching a quantized N(0, scale) matrix) instead of running
    the full codec, which matters at 6B scale on one host core."""
    rng = np.random.default_rng(seed)
    E, V = cfg.n_embd, cfg.n_vocab

    def q_fast(shape_kn):
        from ..quant.device import QTensor
        k, n = shape_kn
        if wtype == GGMLType.Q4_0:
            qs = rng.integers(0, 256, (k // 2, n), dtype=np.uint8)
            sc = (np.abs(rng.standard_normal((k // 32, n))) * scale / 4.6).astype(np.float32)
            return QTensor("nib4", qs, sc, None, k, n, wtype, zero=8)
        if wtype == GGMLType.Q8_0:
            qv = rng.integers(-127, 128, (k, n), dtype=np.int8)
            sc = (np.abs(rng.standard_normal((k // 32, n))) * scale / 74).astype(np.float32)
            return QTensor("int8", qv, sc, None, k, n, wtype)
        w = (rng.standard_normal((k, n)) * scale).astype(np.float32)
        return quantize_for_device(w, wtype)

    def q(shape_kn):
        if fast:
            return q_fast(shape_kn)
        w = (rng.standard_normal(shape_kn) * scale).astype(np.float32)
        return quantize_for_device(w, wtype)

    def vec(n):
        return jnp.asarray((rng.standard_normal(n) * scale).astype(np.float32))

    params = {
        "wte": q((E, V)), "ln_f_g": vec(E) + 1.0, "ln_f_b": vec(E),
        "lmh_w": q((E, V)), "lmh_b": vec(V),
        "layers": [],
    }
    for _ in range(cfg.n_layer):
        params["layers"].append({
            "ln_1_g": vec(E) + 1.0, "ln_1_b": vec(E),
            "q_w": q((E, E)), "k_w": q((E, E)), "v_w": q((E, E)), "o_w": q((E, E)),
            "fc_in_w": q((E, 4 * E)), "fc_in_b": vec(4 * E),
            "fc_out_w": q((4 * E, E)), "fc_out_b": vec(E),
        })
    return params


def synthetic_params_device(cfg: GPTJConfig, wtype: GGMLType = GGMLType.Q4_0,
                            seed: int = 0, scale: float = 0.02):
    """Like synthetic_params(fast=True) but generates the packed payloads
    *on device* with jax.random — no multi-GB host->device transfer over the
    tunneled runtime (staging 6B Q4_0 from host measured 100s+; on-device
    generation is sub-second per tensor)."""
    import jax
    from ..quant.device import QTensor

    key = jax.random.key(seed)
    E, V = cfg.n_embd, cfg.n_vocab
    counter = [0]

    def q(shape_kn):
        k, n = shape_kn
        counter[0] += 1
        kq, ks = jax.random.split(jax.random.fold_in(key, counter[0]))
        if wtype == GGMLType.Q4_0:
            qs = jax.random.randint(kq, (k // 2, n), 0, 256, dtype=jnp.uint8)
            sc = jnp.abs(jax.random.normal(ks, (k // 32, n), jnp.float32)) * (scale / 4.6)
            return QTensor("nib4", qs, sc, None, k, n, wtype, zero=8)
        if wtype == GGMLType.Q8_0:
            qv = jax.random.randint(kq, (k, n), -127, 128, dtype=jnp.int8)
            sc = jnp.abs(jax.random.normal(ks, (k // 32, n), jnp.float32)) * (scale / 74)
            return QTensor("int8", qv, sc, None, k, n, wtype)
        w = jax.random.normal(kq, (k, n), jnp.float32) * scale
        return QTensor("dense", w.astype(jnp.bfloat16), None, None, k, n, wtype)

    def vec(n):
        counter[0] += 1
        return jax.random.normal(jax.random.fold_in(key, counter[0]),
                                 (n,), jnp.float32) * scale

    params = {
        "wte": q((E, V)), "ln_f_g": vec(E) + 1.0, "ln_f_b": vec(E),
        "lmh_w": q((E, V)), "lmh_b": vec(V),
        "layers": [],
    }
    for _ in range(cfg.n_layer):
        params["layers"].append({
            "ln_1_g": vec(E) + 1.0, "ln_1_b": vec(E),
            "q_w": q((E, E)), "k_w": q((E, E)), "v_w": q((E, E)), "o_w": q((E, E)),
            "fc_in_w": q((E, 4 * E)), "fc_in_b": vec(4 * E),
            "fc_out_w": q((4 * E, E)), "fc_out_b": vec(E),
        })
    return params


def from_hf_state_dict(cfg: GPTJConfig, sd: dict, wtype: GGMLType = GGMLType.F32):
    """HF GPTJForCausalLM state dict -> params. HF Linear weights are
    (out, in); our qmatmul wants (K=in, N=out), i.e. the transpose."""
    def q2d(w):
        w = np.ascontiguousarray(np.asarray(w, np.float32).T)  # (in, out)
        if wtype in (GGMLType.F32, GGMLType.F16, GGMLType.BF16):
            from ..quant import codecs
            raw = codecs.quantize(np.ascontiguousarray(w.T), wtype)
            return to_device_format(raw, wtype, (w.shape[0], w.shape[1]))
        return quantize_for_device(w, wtype)

    def arr(x):
        return jnp.asarray(np.asarray(x, np.float32))

    params = {
        "wte": q2d(sd["transformer.wte.weight"]),       # (V, E) -> (E, V)
        "ln_f_g": arr(sd["transformer.ln_f.weight"]),
        "ln_f_b": arr(sd["transformer.ln_f.bias"]),
        "lmh_w": q2d(sd["lm_head.weight"]),
        "lmh_b": arr(sd["lm_head.bias"]),
        "layers": [],
    }
    for i in range(cfg.n_layer):
        p = f"transformer.h.{i}"
        params["layers"].append({
            "ln_1_g": arr(sd[f"{p}.ln_1.weight"]), "ln_1_b": arr(sd[f"{p}.ln_1.bias"]),
            "q_w": q2d(sd[f"{p}.attn.q_proj.weight"]),
            "k_w": q2d(sd[f"{p}.attn.k_proj.weight"]),
            "v_w": q2d(sd[f"{p}.attn.v_proj.weight"]),
            "o_w": q2d(sd[f"{p}.attn.out_proj.weight"]),
            "fc_in_w": q2d(sd[f"{p}.mlp.fc_in.weight"]),
            "fc_in_b": arr(sd[f"{p}.mlp.fc_in.bias"]),
            "fc_out_w": q2d(sd[f"{p}.mlp.fc_out.weight"]),
            "fc_out_b": arr(sd[f"{p}.mlp.fc_out.bias"]),
        })
    return params


def fuse_qkv(params):
    """Concatenate each layer's q/k/v projections AND fc_in into one
    (E, 3E + 4E) QTensor. GPT-J's attention and MLP read the SAME normed
    input (parallel structure, main.cpp:535), so the decode path runs ONE
    fused GEMV per layer for all four projections — one weight stream, one
    activation quantization, one kernel dispatch instead of two.
    Call BEFORE params_repack_device."""
    import os
    from ..quant.device import concat_qtensors
    # GGML_FUSE_FF=1 additionally folds fc_in into the fused GEMV (one
    # dispatch fewer per layer). A/B at 6B decode was inconclusive under
    # tunnel-server drift (fused never measured faster; qkv-only measured
    # 144.6 tok/s in the best state), so qkv-only stays the default.
    with_ff = os.environ.get("GGML_FUSE_FF", "0") == "1"
    out = dict(params)
    out["layers"] = []
    for lp in params["layers"]:
        lp = dict(lp)
        if with_ff:
            lp["qkvf_w"] = concat_qtensors([lp.pop("q_w"), lp.pop("k_w"),
                                            lp.pop("v_w"),
                                            lp.pop("fc_in_w")])
        else:
            lp["qkv_w"] = concat_qtensors([lp.pop("q_w"), lp.pop("k_w"),
                                           lp.pop("v_w")])
        out["layers"].append(lp)
    return out


def split_rope_prep(params, cfg: GPTJConfig):
    """Permute each layer's q/k projection columns so interleaved rope
    pairs (2i, 2i+1) land at split halves (i, D/2+i), and mark the params
    (`rope_split` key) so forward() applies ops.rope.rope_split — the
    rotation becomes two contiguous half-block FMAs with no lane
    interleave (measured r05: the interleaved apply was the largest
    single elementwise cost of the prefill pass, docs/PREFILL_BREAKDOWN).

    EXACT: attention scores are invariant to a consistent permutation of
    q and k head dims, v/o are untouched, and quantized column
    permutation never crosses a K-block (quant.device.permute_qtensor_cols)
    — logits match the unpermuted model bit-for-bit up to dot-order
    reassociation. Call BEFORE fuse_qkv / params_repack_device."""
    from ..ops.rope import split_rope_permutation
    from ..quant.device import permute_qtensor_cols
    if "rope_split" in params:      # idempotent: already permuted
        return params
    D, H = cfg.head_dim, cfg.n_head
    perm = (np.arange(H)[:, None] * D +
            split_rope_permutation(D)[None, :]).reshape(-1)
    out = dict(params)
    out["layers"] = []
    for lp in params["layers"]:
        lp = dict(lp)
        assert "q_w" in lp and "k_w" in lp, "split_rope_prep before fuse_qkv"
        lp["q_w"] = permute_qtensor_cols(lp["q_w"], perm)
        lp["k_w"] = permute_qtensor_cols(lp["k_w"], perm)
        out["layers"].append(lp)
    out["rope_split"] = None    # empty pytree subtree = static marker
    return out


def pad_lm_head(params, multiple: int | None = None):
    """Pad lmh_w's vocab dim so the LM head takes the fused Pallas path
    (qmatmul's `n % 128` gate — GPT-J's 50400 otherwise silently falls back
    to XLA dequant). Padded logit columns get a -1e30 bias so argmax/top-k
    never select them; forward() slices logits back to cfg.n_vocab. Call
    BEFORE params_repack_device.

    multiple=None picks 2048 for production-size vocabs (>=16384) so the
    decode GEMV keeps full-width n-tiles — 50400 padded only to a 128
    multiple (50432 = 256*197) forces bn=256 and measurably halves the LM
    head's weight-stream bandwidth — and 128 for small/test vocabs where a
    2048 pad would dominate the matrix."""
    from ..quant.device import pad_qtensor_cols
    h = params["lmh_w"]
    if h.kind == "dense":
        return params
    if multiple is None:
        multiple = int(os.environ.get("GGML_LMH_PAD", "0")) or \
            (2048 if h.n >= 16384 else 128)
    h2, npad = pad_qtensor_cols(h, multiple)
    if npad == 0:
        return params
    out = dict(params)
    out["lmh_w"] = h2
    out["lmh_b"] = jnp.pad(jnp.asarray(params["lmh_b"]), (0, npad),
                           constant_values=-1e30)
    return out


def prepare_fused(params, cfg=None):
    """One-call decode fast-path prep: split-half rope layout (when cfg is
    given) + fuse_qkv (+GGML_FUSE_FF) + LM-head vocab padding. The
    Engine's residency="q4-fused" and bench.py both use this, so the
    public API reproduces the headline-bench graph. Call BEFORE
    params_repack_device. GGML_ROPE_SPLIT=0 keeps the interleaved rope
    for A/B."""
    if cfg is not None and os.environ.get("GGML_ROPE_SPLIT", "1") == "1":
        params = split_rope_prep(params, cfg)
    return pad_lm_head(fuse_qkv(params))


def fuse_out(params):
    """Concatenate each layer's out_proj and fc_out along the contraction
    axis into one (E + 4E, E) QTensor. GPT-J's attention output and MLP
    output are SUMMED into the same residual (parallel structure,
    examples/gpt-j/main.cpp:535), so
        attn @ Wo + ff @ Wfc_out == concat([attn, ff]) @ concat_k([Wo, Wfc_out])
    exactly (quant blocks are 32-aligned at the seam). Decode then runs ONE
    fused GEMV for both output projections — with fuse_qkv(GGML_FUSE_FF=1)
    a whole layer is two GEMV dispatches. Call BEFORE params_repack_device."""
    from ..quant.device import concat_qtensors_k
    out = dict(params)
    out["layers"] = []
    for lp in params["layers"]:
        lp = dict(lp)
        lp["of_w"] = concat_qtensors_k([lp.pop("o_w"), lp.pop("fc_out_w")])
        out["layers"].append(lp)
    return out


def stack_model(params):
    """Fused+repacked params -> stacked decode layout: the per-layer list
    becomes one dict of stacked leaves ('stack') and forward() runs
    lax.scan over layers (one compiled layer body — the executable-size/
    warmup fix; see quant.device.stack_layers). Call AFTER fuse_qkv /
    fuse_out / params_repack_device."""
    from ..quant.device import stack_layers
    out = dict(params)
    out["stack"] = stack_layers(out.pop("layers"))
    return out


def _forward_stacked(cfg: GPTJConfig, params, tokens, positions, cache,
                     n_past, *, compute_dtype, precision, cells, mask,
                     cells_kernel=False):
    from ..ops.decode_attention import (decode_attention_cells,
                                        decode_attention_stacked,
                                        decode_attention_update_cells,
                                        decode_attention_update_stacked,
                                        select_decode_path)
    from ..ops.qmatmul import qmatmul_stacked
    from ..quant.device import QTensor
    import jax

    B, T = tokens.shape
    H, D, E = cfg.n_head, cfg.head_dim, cfg.n_embd
    st = params["stack"]
    qts = {k: v for k, v in st.items() if isinstance(v, QTensor)}
    small = {k: v for k, v in st.items() if not isinstance(v, QTensor)}

    x = get_rows(params["wte"], tokens, dtype=jnp.float32)
    if mask is None:
        mask = attention_mask(positions, cache.n_ctx, n_past)
    path = select_decode_path(T=T, B=B, D=D, cells=cells, cache=cache,
                              cells_kernel=cells_kernel, mask=mask)

    # split-half rope layout (split_rope_prep): structural marker, static
    # under jit — the q/k columns were permuted at load
    if "rope_split" in params:
        _rope = lambda v: rope_split(v, positions, n_dims=cfg.n_rot)
    else:
        _rope = lambda v: rope(v, positions, n_dims=cfg.n_rot, mode=0)

    def body(carry, xs):
        x, cache = carry
        li, sm = xs
        cur = layer_norm(x, sm["ln_1_g"], sm["ln_1_b"])
        ff_pre = None
        if "qkvf_w" in qts:
            qkvf = qmatmul_stacked(cur, qts["qkvf_w"], li)
            qkv = qkvf[..., :3 * E].reshape(B, T, 3, H, D)
            q, kk, vv = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            ff_pre = qkvf[..., 3 * E:]
        else:
            qkv = qmatmul_stacked(cur, qts["qkv_w"], li).reshape(B, T, 3, H, D)
            q, kk, vv = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = _rope(q)
        kk = _rope(kk)
        if path == "cells":
            attn, cache2 = decode_attention_update_cells(
                cache, li, q.reshape(T, 1, H, D), kk.reshape(T, 1, H, D),
                vv.reshape(T, 1, H, D), cells[0], mask[0, 0])
            attn = attn.reshape(B, T, H, D)
        elif path == "cells2":
            cache2 = update_kv_cells(cache, li, kk, vv, cells)
            attn = decode_attention_cells(
                cache2, li, q.reshape(T, 1, H, D), mask[0, 0])
            attn = attn.reshape(B, T, H, D)
        elif path == "fused":
            attn, cache2 = decode_attention_update_stacked(
                cache, li, q, kk, vv, n_past, mask)
        elif path == "kernel":
            cache2 = update_kv(cache, li, kk, vv, n_past)
            attn = decode_attention_stacked(cache2, li, q, mask)
        else:
            cache2 = update_kv(cache, li, kk, vv, n_past) if cells is None \
                else update_kv_cells(cache, li, kk, vv, cells)
            attn = attention(q, *read_kv(cache2, li, dtype=q.dtype), mask,
                             out_dtype=jnp.float32, precision=precision)
        attn = attn.reshape(B, T, E)
        if ff_pre is None:
            ff_pre = qmatmul_stacked(cur, qts["fc_in_w"], li)
        ff = gelu(ff_pre + sm["fc_in_b"])
        if "of_w" in qts:
            y = qmatmul_stacked(jnp.concatenate([attn, ff], axis=-1),
                                qts["of_w"], li)
            x = x + y + sm["fc_out_b"]
        else:
            attn = qmatmul_stacked(attn, qts["o_w"], li)
            ff = qmatmul_stacked(ff, qts["fc_out_w"], li) + sm["fc_out_b"]
            x = x + attn + ff
        return (x, cache2), None

    lis = jnp.arange(cfg.n_layer, dtype=jnp.int32)
    from .common import scan_layers
    (x, cache), _ = scan_layers(body, (x, cache), lis, small)
    x = layer_norm(x, params["ln_f_g"], params["ln_f_b"])
    logits = qmatmul(x, params["lmh_w"], compute_dtype=compute_dtype,
                     out_dtype=jnp.float32,
                     precision=precision) + params["lmh_b"]
    if params["lmh_w"].n > cfg.n_vocab:       # pad_lm_head columns
        logits = logits[..., :cfg.n_vocab]
    return logits, cache


def init_cache(cfg: GPTJConfig, batch: int = 1, n_ctx: int | None = None,
               dtype=jnp.bfloat16, flat: bool = False) -> KVCache:
    return init_kv_cache(cfg.n_layer, batch, n_ctx or cfg.n_ctx,
                         cfg.n_head, cfg.head_dim, dtype, flat=flat)


def forward(cfg: GPTJConfig, params, tokens, positions, cache: KVCache, n_past,
            *, compute_dtype=jnp.bfloat16, precision=None,
            cells=None, mask=None, cells_kernel=False):
    if "stack" in params:
        return _forward_stacked(cfg, params, tokens, positions, cache,
                                n_past, compute_dtype=compute_dtype,
                                precision=precision, cells=cells, mask=mask,
                                cells_kernel=cells_kernel)
    B, T = tokens.shape
    H, D, E = cfg.n_head, cfg.head_dim, cfg.n_embd

    mm = lambda x, w: qmatmul(x, w, compute_dtype=compute_dtype,
                              out_dtype=jnp.float32, precision=precision)

    x = get_rows(params["wte"], tokens, dtype=jnp.float32)
    # celled-KV path (continuous batching, runtime/batched.py): explicit
    # destination cells + externally built per-cell mask (SURVEY.md §A.3)
    if mask is None:
        mask = attention_mask(positions, cache.n_ctx, n_past)

    if "rope_split" in params:      # split_rope_prep layout (static)
        _rope = lambda v: rope_split(v, positions, n_dims=cfg.n_rot)
    else:
        _rope = lambda v: rope(v, positions, n_dims=cfg.n_rot, mode=0)

    for li, lp in enumerate(params["layers"]):
        cur = layer_norm(x, lp["ln_1_g"], lp["ln_1_b"])
        ff_pre = None
        if "qkvf_w" in lp:
            # fused QKV+FC_in (fuse_qkv): attention and MLP share `cur`
            # (parallel structure), so ONE GEMV feeds all four projections
            qkvf = mm(cur, lp["qkvf_w"])
            qkv = constrain_heads(qkvf[..., :3 * E].reshape(B, T, 3, H, D))
            q, kk, vv = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            ff_pre = qkvf[..., 3 * E:]
        elif "qkv_w" in lp:
            # fused QKV only (legacy layout): one GEMV instead of three
            qkv = constrain_heads(
                mm(cur, lp["qkv_w"]).reshape(B, T, 3, H, D))
            q, kk, vv = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        else:
            q = constrain_heads(mm(cur, lp["q_w"]).reshape(B, T, H, D))
            kk = constrain_heads(mm(cur, lp["k_w"]).reshape(B, T, H, D))
            vv = constrain_heads(mm(cur, lp["v_w"]).reshape(B, T, H, D))
        q = _rope(q)
        kk = _rope(kk)

        if cells is None:
            cache = update_kv(cache, li, kk, vv, n_past)
        else:
            cache = update_kv_cells(cache, li, kk, vv, cells)
        attn = attention(q, *read_kv(cache, li, dtype=q.dtype), mask,
                             out_dtype=jnp.float32, precision=precision)
        attn = attn.reshape(B, T, E)

        # parallel attention + MLP on the same normed input (main.cpp:535)
        if ff_pre is None:
            ff_pre = mm(cur, lp["fc_in_w"])
        ff = gelu(ff_pre + lp["fc_in_b"])
        if "of_w" in lp:
            # fused output projections (fuse_out): attn @ Wo + ff @ Wfc_out
            # as ONE GEMV over the concatenated activations
            y = mm(jnp.concatenate([attn, ff], axis=-1), lp["of_w"])
            x = x + y + lp["fc_out_b"]
        else:
            attn = mm(attn, lp["o_w"])
            ff = mm(ff, lp["fc_out_w"]) + lp["fc_out_b"]
            x = x + attn + ff

    x = layer_norm(x, params["ln_f_g"], params["ln_f_b"])
    logits = qmatmul(x, params["lmh_w"], compute_dtype=compute_dtype,
                     out_dtype=jnp.float32, precision=precision) + params["lmh_b"]
    if params["lmh_w"].n > cfg.n_vocab:       # pad_lm_head columns
        logits = logits[..., :cfg.n_vocab]
    return logits, cache
