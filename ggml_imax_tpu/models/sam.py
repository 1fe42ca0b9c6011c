"""SAM (Segment Anything, ViT-B) — promptable image segmentation.

Reference: examples/sam in /root/reference (2,232 LoC) —
- hparams + file header: main.cpp:29-68, 496-523 (legacy .bin, no vocab),
  tensor names :746-930.
- image encoder (ViT-B): patch-embed conv s16 (main.cpp:1158-1166),
  +pos_embed, 12 pre-LN blocks with *windowed* attention (ggml_win_part
  window 14, :1238) except global layers {2,5,8,11} (:50-62), decomposed
  relative-position attention (ggml_get_rel_pos/ggml_add_rel_pos,
  :1282-1294), MLP; neck conv1x1 -> LayerNorm2d -> conv3x3 -> LayerNorm2d
  (:1349-1360).
- prompt encoder: random-Gaussian Fourier point PE (sin|cos), point-label
  embeddings, no-mask dense embedding (sam_encode_prompt, :1396-1450).
- mask decoder: [iou_token | 4 mask_tokens | sparse prompt] queries through
  a 2-layer two-way transformer + final token->image attention
  (sam_decode_mask, :1547-1710), 2x2 ConvTranspose upscaling stack,
  per-token hypernetwork MLPs, IoU head; first mask/IoU dropped
  (multimask output, :1760-1770).

TPU-native: every stage is a pure jitted function; window partitioning and
relative positions use ops.tensor_ops; batch = number of prompts.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..io.legacy_bin import read_legacy_bin
from ..ops.activations import gelu, relu
from ..ops.conv import conv_2d, conv_transpose_2d_p0
from ..ops.norms import layer_norm
from ..ops.tensor_ops import add_rel_pos, get_rel_pos, win_part, win_unpart

PIXEL_MEAN = np.asarray([123.675, 116.280, 103.530], np.float32)
PIXEL_STD = np.asarray([58.395, 57.120, 57.375], np.float32)


@dataclass(frozen=True)
class SamConfig:
    n_enc_state: int = 768
    n_enc_layer: int = 12
    n_enc_head: int = 12
    n_enc_out_chans: int = 256
    n_pt_embd: int = 4
    n_dec_heads: int = 8
    n_img_size: int = 1024
    n_window_size: int = 14
    n_patch_size: int = 16
    eps: float = 1e-6
    eps_decoder: float = 1e-5
    global_attn: tuple = (2, 5, 8, 11)      # ViT-B (main.cpp:50-62)

    @property
    def n_img_embd(self):
        return self.n_img_size // self.n_patch_size

    @property
    def head_dim(self):
        return self.n_enc_state // self.n_enc_head


HPARAM_NAMES = ["n_enc_state", "n_enc_layer", "n_enc_head",
                "n_enc_out_chans", "n_pt_embd", "ftype"]


def load_legacy(path: str | Path):
    import math
    from dataclasses import replace as _rp
    f = read_legacy_bin(path, HPARAM_NAMES, has_vocab=False)
    cfg = SamConfig(f.hparams["n_enc_state"], f.hparams["n_enc_layer"],
                    f.hparams["n_enc_head"], f.hparams["n_enc_out_chans"],
                    f.hparams["n_pt_embd"])
    from ..quant import codecs

    def t(name):
        x = f.tensors[name]
        return jnp.asarray(codecs.dequantize(x.data, x.ggml_type,
                                             shape=tuple(reversed(x.shape))))

    # image size is not in the header (the reference hardcodes 1024); derive
    # the grid from the stored positional embedding so reduced checkpoints
    # (tests) load too
    E = cfg.n_enc_state
    n_pe = f.tensors["image_encoder.pos_embed"].data.nbytes // 4
    I = int(math.isqrt(n_pe // E))
    cfg = _rp(cfg, n_img_size=I * cfg.n_patch_size)
    p = {
        "pe": t("image_encoder.pos_embed").reshape(I, I, E),
        "proj_w": t("image_encoder.patch_embed.proj.weight"),
        "proj_b": t("image_encoder.patch_embed.proj.bias"),
        "neck_conv0": t("image_encoder.neck.0.weight"),
        "neck_n0_g": t("image_encoder.neck.1.weight"),
        "neck_n0_b": t("image_encoder.neck.1.bias"),
        "neck_conv1": t("image_encoder.neck.2.weight"),
        "neck_n1_g": t("image_encoder.neck.3.weight"),
        "neck_n1_b": t("image_encoder.neck.3.bias"),
        "enc_layers": [],
        "pe_gauss": t("prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"),
        "not_a_pt": t("prompt_encoder.not_a_point_embed.weight").reshape(-1),
        "no_mask": t("prompt_encoder.no_mask_embed.weight").reshape(-1),
        "pt_embd": [t(f"prompt_encoder.point_embeddings.{i}.weight").reshape(-1)
                    for i in range(cfg.n_pt_embd)],
    }
    for i in range(cfg.n_enc_layer):
        pre = f"image_encoder.blocks.{i}"
        p["enc_layers"].append({
            "n1_g": t(f"{pre}.norm1.weight"), "n1_b": t(f"{pre}.norm1.bias"),
            "rel_w": t(f"{pre}.attn.rel_pos_w"),
            "rel_h": t(f"{pre}.attn.rel_pos_h"),
            "qkv_w": t(f"{pre}.attn.qkv.weight").T,
            "qkv_b": t(f"{pre}.attn.qkv.bias"),
            "proj_w": t(f"{pre}.attn.proj.weight").T,
            "proj_b": t(f"{pre}.attn.proj.bias"),
            "n2_g": t(f"{pre}.norm2.weight"), "n2_b": t(f"{pre}.norm2.bias"),
            "mlp1_w": t(f"{pre}.mlp.lin1.weight").T,
            "mlp1_b": t(f"{pre}.mlp.lin1.bias"),
            "mlp2_w": t(f"{pre}.mlp.lin2.weight").T,
            "mlp2_b": t(f"{pre}.mlp.lin2.bias"),
        })
    p["dec"] = _load_decoder(cfg, t)
    return cfg, p


def _load_decoder(cfg, t):
    def attn(prefix):
        return {k: t(f"{prefix}.{n}.weight").T for k, n in
                [("q_w", "q_proj"), ("k_w", "k_proj"), ("v_w", "v_proj"),
                 ("o_w", "out_proj")]} | \
               {k: t(f"{prefix}.{n}.bias") for k, n in
                [("q_b", "q_proj"), ("k_b", "k_proj"), ("v_b", "v_proj"),
                 ("o_b", "out_proj")]}

    d = {"layers": []}
    base = "mask_decoder.transformer.layers"
    for i in range(2):
        pre = f"{base}.{i}"
        d["layers"].append({
            "self": attn(f"{pre}.self_attn"),
            "t2i": attn(f"{pre}.cross_attn_token_to_image"),
            "i2t": attn(f"{pre}.cross_attn_image_to_token"),
            "n1_g": t(f"{pre}.norm1.weight"), "n1_b": t(f"{pre}.norm1.bias"),
            "n2_g": t(f"{pre}.norm2.weight"), "n2_b": t(f"{pre}.norm2.bias"),
            "n3_g": t(f"{pre}.norm3.weight"), "n3_b": t(f"{pre}.norm3.bias"),
            "n4_g": t(f"{pre}.norm4.weight"), "n4_b": t(f"{pre}.norm4.bias"),
            "mlp1_w": t(f"{pre}.mlp.lin1.weight").T,
            "mlp1_b": t(f"{pre}.mlp.lin1.bias"),
            "mlp2_w": t(f"{pre}.mlp.lin2.weight").T,
            "mlp2_b": t(f"{pre}.mlp.lin2.bias"),
        })
    d["final_t2i"] = attn("mask_decoder.transformer.final_attn_token_to_image")
    d["nf_g"] = t("mask_decoder.transformer.norm_final_attn.weight")
    d["nf_b"] = t("mask_decoder.transformer.norm_final_attn.bias")
    d["up0_w"] = t("mask_decoder.output_upscaling.0.weight")
    d["up0_b"] = t("mask_decoder.output_upscaling.0.bias")
    d["up1_g"] = t("mask_decoder.output_upscaling.1.weight")
    d["up1_b"] = t("mask_decoder.output_upscaling.1.bias")
    d["up3_w"] = t("mask_decoder.output_upscaling.3.weight")
    d["up3_b"] = t("mask_decoder.output_upscaling.3.bias")
    d["hyper"] = [
        {w: t(f"mask_decoder.output_hypernetworks_mlps.{i}.layers.{j}.weight").T
         for j, w in enumerate(("w0", "w1", "w2"))} |
        {b: t(f"mask_decoder.output_hypernetworks_mlps.{i}.layers.{j}.bias")
         for j, b in enumerate(("b0", "b1", "b2"))}
        for i in range(4)]
    d["iou"] = {w: t(f"mask_decoder.iou_prediction_head.layers.{j}.weight").T
                for j, w in enumerate(("w0", "w1", "w2"))} | \
               {b: t(f"mask_decoder.iou_prediction_head.layers.{j}.bias")
                for j, b in enumerate(("b0", "b1", "b2"))}
    d["iou_token"] = t("mask_decoder.iou_token.weight")
    d["mask_tokens"] = t("mask_decoder.mask_tokens.weight")
    return d


def synthetic_params(cfg: SamConfig, rng: np.random.Generator, scale=0.05):
    E, I, C = cfg.n_enc_state, cfg.n_img_embd, cfg.n_enc_out_chans

    def d(*shape):
        return jnp.asarray((rng.standard_normal(shape) * scale).astype(np.float32))

    def ones(n):
        return jnp.ones(n, jnp.float32)

    def attn(dim, kv=None):
        kv = kv or dim
        return {"q_w": d(C, kv), "k_w": d(C, kv), "v_w": d(C, kv),
                "o_w": d(kv, C), "q_b": d(kv), "k_b": d(kv), "v_b": d(kv),
                "o_b": d(C)}

    p = {"pe": d(I, I, E), "proj_w": d(E, 3, cfg.n_patch_size, cfg.n_patch_size),
         "proj_b": d(E),
         "neck_conv0": d(C, E, 1, 1), "neck_n0_g": ones(C), "neck_n0_b": d(C),
         "neck_conv1": d(C, C, 3, 3), "neck_n1_g": ones(C), "neck_n1_b": d(C),
         "enc_layers": [],
         "pe_gauss": d(2, C // 2), "not_a_pt": d(C), "no_mask": d(C),
         "pt_embd": [d(C) for _ in range(cfg.n_pt_embd)]}
    maxrel = 2 * max(cfg.n_window_size, I) - 1
    for _ in range(cfg.n_enc_layer):
        p["enc_layers"].append({
            "n1_g": ones(E), "n1_b": d(E),
            "rel_w": d(maxrel, cfg.head_dim), "rel_h": d(maxrel, cfg.head_dim),
            "qkv_w": d(E, 3 * E), "qkv_b": d(3 * E),
            "proj_w": d(E, E), "proj_b": d(E),
            "n2_g": ones(E), "n2_b": d(E),
            "mlp1_w": d(E, 4 * E), "mlp1_b": d(4 * E),
            "mlp2_w": d(4 * E, E), "mlp2_b": d(E),
        })
    dec = {"layers": []}
    for _ in range(2):
        dec["layers"].append({
            "self": attn(C), "t2i": attn(C, C // 2), "i2t": attn(C, C // 2),
            "n1_g": ones(C), "n1_b": d(C), "n2_g": ones(C), "n2_b": d(C),
            "n3_g": ones(C), "n3_b": d(C), "n4_g": ones(C), "n4_b": d(C),
            "mlp1_w": d(C, 8 * C), "mlp1_b": d(8 * C),
            "mlp2_w": d(8 * C, C), "mlp2_b": d(C),
        })
    dec["final_t2i"] = attn(C, C // 2)
    dec["nf_g"], dec["nf_b"] = ones(C), d(C)
    dec["up0_w"] = d(C, C // 4, 2, 2)
    dec["up0_b"] = d(C // 4)
    dec["up1_g"], dec["up1_b"] = ones(C // 4), d(C // 4)
    dec["up3_w"] = d(C // 4, C // 8, 2, 2)
    dec["up3_b"] = d(C // 8)
    dec["hyper"] = [{"w0": d(C, C), "b0": d(C), "w1": d(C, C), "b1": d(C),
                     "w2": d(C, C // 8), "b2": d(C // 8)} for _ in range(4)]
    dec["iou"] = {"w0": d(C, C), "b0": d(C), "w1": d(C, C), "b1": d(C),
                  "w2": d(C, 4), "b2": d(4)}
    dec["iou_token"] = d(1, C)
    dec["mask_tokens"] = d(4, C)
    p["dec"] = dec
    return p


def _ln2d(x, g, b, eps):
    """sam_layer_norm_2d: layer norm over channels of (B, C, H, W)."""
    mu = x.mean(axis=1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=1, keepdims=True)
    y = (x - mu) / jnp.sqrt(var + eps)
    return y * g[None, :, None, None] + b[None, :, None, None]


def encode_image(cfg: SamConfig, params, img):
    """img: (B, 3, n_img_size, n_img_size) preprocessed ->
    (B, n_enc_out_chans, n_img_embd, n_img_embd)."""
    H = cfg.n_enc_head
    D = cfg.head_dim
    E = cfg.n_enc_state
    x = conv_2d(img, params["proj_w"], s0=cfg.n_patch_size,
                s1=cfg.n_patch_size) + params["proj_b"][None, :, None, None]
    x = x.transpose(0, 2, 3, 1) + params["pe"][None]        # (B, I, I, E)

    for il, lp in enumerate(params["enc_layers"]):
        shortcut = x
        h = layer_norm(x, lp["n1_g"], lp["n1_b"], eps=cfg.eps)
        b0, h0, w0, _ = h.shape
        local = il not in cfg.global_attn
        if local:
            h = win_part(h, cfg.n_window_size)
        bw, hh, ww, _ = h.shape

        qkv = (h.reshape(bw, hh * ww, E) @ lp["qkv_w"]) + lp["qkv_b"]
        qkv = qkv.reshape(bw, hh * ww, 3, H, D).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]                    # (bw, H, hw, D)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(D).astype(q.dtype)

        rw = get_rel_pos(lp["rel_w"], ww, ww)               # (W, W, D)
        rh = get_rel_pos(lp["rel_h"], hh, hh)
        qr = q.reshape(bw * H, hh, ww, D)
        rel_w = jnp.einsum("bhwd,wkd->bhwk", qr, rw)        # (.., hh, ww, W)
        rel_h = jnp.einsum("bhwd,hkd->bhwk",
                           qr.transpose(0, 2, 1, 3), rh).transpose(0, 2, 1, 3)
        s = add_rel_pos(s.reshape(bw * H, hh * ww, hh * ww), rel_w, rel_h)
        a = jax.nn.softmax(s, axis=-1).reshape(bw, H, hh * ww, hh * ww)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, v)
        o = o.transpose(0, 2, 1, 3).reshape(bw, hh, ww, E)
        o = o @ lp["proj_w"] + lp["proj_b"]
        if local:
            o = win_unpart(o, h0, w0, cfg.n_window_size)
        x = shortcut + o
        m = layer_norm(x, lp["n2_g"], lp["n2_b"], eps=cfg.eps)
        m = gelu(m @ lp["mlp1_w"] + lp["mlp1_b"]) @ lp["mlp2_w"] + lp["mlp2_b"]
        x = x + m

    x = x.transpose(0, 3, 1, 2)                             # (B, E, I, I)
    x = conv_2d(x, params["neck_conv0"])
    x = _ln2d(x, params["neck_n0_g"], params["neck_n0_b"], cfg.eps)
    x = conv_2d(x, params["neck_conv1"], p0=1, p1=1)
    return _ln2d(x, params["neck_n1_g"], params["neck_n1_b"], cfg.eps)


def _pe_encode(params, coords01):
    """Fourier point PE (prompt_encoder.py:L192 semantics): coords in [0,1]
    -> (..., C) [sin|cos] features."""
    c = 2.0 * coords01 - 1.0
    proj = (c @ params["pe_gauss"]) * (2.0 * np.pi)
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def encode_prompt(cfg: SamConfig, params, point01):
    """One foreground point (x, y) in [0,1] -> (sparse (2, C), dense
    (C, I, I)). Row 1 is the not-a-point pad token (sam_encode_prompt)."""
    pt = _pe_encode(params, jnp.asarray(point01, jnp.float32)[None])
    sparse = jnp.stack([pt[0] + params["pt_embd"][1], params["not_a_pt"]])
    I = cfg.n_img_embd
    dense = jnp.broadcast_to(params["no_mask"][:, None, None],
                             (cfg.n_enc_out_chans, I, I))
    return sparse, dense


def image_pe(cfg: SamConfig, params):
    """Dense positional encoding of the image grid -> (C, I, I)."""
    I = cfg.n_img_embd
    ys = (jnp.arange(I, dtype=jnp.float32) + 0.5) / I
    xs = (jnp.arange(I, dtype=jnp.float32) + 0.5) / I
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (I,I,2)
    return _pe_encode(params, grid).transpose(2, 0, 1)


def _dec_attn(a, q, k, v, n_head):
    def split(x, w, b):
        y = x @ w + b
        t, c = y.shape
        return y.reshape(t, n_head, c // n_head).transpose(1, 0, 2)

    qh = split(q, a["q_w"], a["q_b"])
    kh = split(k, a["k_w"], a["k_b"])
    vh = split(v, a["v_w"], a["v_b"])
    s = jnp.einsum("hqd,hkd->hqk", qh, kh) / jnp.sqrt(qh.shape[-1]).astype(q.dtype)
    o = jnp.einsum("hqk,hkd->hqd", jax.nn.softmax(s, -1), vh)
    o = o.transpose(1, 0, 2).reshape(q.shape[0], -1)
    return o @ a["o_w"] + a["o_b"]


def decode_mask(cfg: SamConfig, params, embd_img, sparse, dense, pe_img):
    """-> (masks (3, 4*I, 4*I) logits, iou (3,)) — multimask output with the
    first token dropped (mask_decoder.py:L101 semantics)."""
    dec = params["dec"]
    nh = cfg.n_dec_heads
    eps = cfg.eps_decoder
    C = cfg.n_enc_out_chans
    I = cfg.n_img_embd

    tokens = jnp.concatenate([dec["iou_token"], dec["mask_tokens"], sparse])
    src = (embd_img[0] + dense).reshape(C, I * I).T         # (hw, C)
    pos = pe_img.reshape(C, I * I).T

    q, keys = tokens, src
    for li, lp in enumerate(dec["layers"]):
        if li == 0:
            # skip_first_layer_pe: attn REPLACES queries (main.cpp:1633-1636)
            q = _dec_attn(lp["self"], q, q, q, nh)
        else:
            q0 = q + tokens
            q = q + _dec_attn(lp["self"], q0, q0, q, nh)
        q = layer_norm(q, lp["n1_g"], lp["n1_b"], eps=eps)
        q = q + _dec_attn(lp["t2i"], q + tokens, keys + pos, keys, nh)
        q = layer_norm(q, lp["n2_g"], lp["n2_b"], eps=eps)
        m = relu(q @ lp["mlp1_w"] + lp["mlp1_b"]) @ lp["mlp2_w"] + lp["mlp2_b"]
        q = layer_norm(q + m, lp["n3_g"], lp["n3_b"], eps=eps)
        keys = keys + _dec_attn(lp["i2t"], keys + pos, q + tokens, q, nh)
        keys = layer_norm(keys, lp["n4_g"], lp["n4_b"], eps=eps)

    q = q + _dec_attn(dec["final_t2i"], q + tokens, keys + pos, keys, nh)
    q = layer_norm(q, dec["nf_g"], dec["nf_b"], eps=eps)

    iou_tok, mask_toks = q[0], q[1:5]
    img = keys.T.reshape(1, C, I, I)
    up = conv_transpose_2d_p0(img, dec["up0_w"], 2) + dec["up0_b"][None, :, None, None]
    up = gelu(_ln2d(up, dec["up1_g"], dec["up1_b"], cfg.eps))
    up = conv_transpose_2d_p0(up, dec["up3_w"], 2) + dec["up3_b"][None, :, None, None]
    up = gelu(up)                                           # (1, C/8, 4I, 4I)

    def mlp3(m, x):
        h = relu(x @ m["w0"] + m["b0"])
        h = relu(h @ m["w1"] + m["b1"])
        return h @ m["w2"] + m["b2"]

    hyper = jnp.stack([mlp3(dec["hyper"][i], mask_toks[i]) for i in range(4)])
    flat = up[0].reshape(up.shape[1], -1)                   # (C/8, 16I^2)
    masks = (hyper @ flat).reshape(4, 4 * I, 4 * I)
    iou = mlp3(dec["iou"], iou_tok)
    return masks[1:], iou[1:]


def preprocess(img: np.ndarray, cfg: SamConfig = SamConfig()):
    """img: (H, W, 3) uint8/float -> ((1,3,S,S) normalized+padded, scale)."""
    h, w = img.shape[:2]
    s = cfg.n_img_size / max(h, w)
    nh, nw = int(round(h * s)), int(round(w * s))
    x = jax.image.resize(jnp.asarray(img, jnp.float32), (nh, nw, 3),
                         "bilinear")
    x = (x - PIXEL_MEAN) / PIXEL_STD
    out = jnp.zeros((cfg.n_img_size, cfg.n_img_size, 3), jnp.float32)
    out = out.at[:nh, :nw].set(x)
    return out.transpose(2, 0, 1)[None], (nh, nw)


def predict(cfg: SamConfig, params, img: np.ndarray, point_xy,
            *, mask_threshold: float = 0.0):
    """Full pipeline for one image + one foreground point (pixel coords).
    Returns (binary masks (3, H, W), iou (3,))."""
    h, w = img.shape[:2]
    x, (nh, nw) = preprocess(img, cfg)
    embd = jax.jit(lambda p, v: encode_image(cfg, p, v))(params, x)
    pt01 = (np.asarray(point_xy, np.float32) * (nh / h, nw / w)
            / cfg.n_img_size)
    sparse, dense = encode_prompt(cfg, params, pt01)
    masks, iou = decode_mask(cfg, params, embd, sparse, dense,
                             image_pe(cfg, params))
    # crop padding, upscale to original resolution (sam.py:L140)
    mi = masks.shape[-1]
    crop_h, crop_w = int(mi * nh / cfg.n_img_size), int(mi * nw / cfg.n_img_size)
    m = jax.image.resize(masks[:, :crop_h, :crop_w], (3, h, w), "bilinear")
    return np.asarray(m) > mask_threshold, np.asarray(iou)
