"""SAM model tests: shapes + invariants on a reduced synthetic config
(the reference validates sam via a fixed-image CI run, ci/run.sh)."""
import numpy as np
import pytest

import jax.numpy as jnp

from ggml_imax_tpu.models import sam


@pytest.fixture(scope="module")
def tiny():
    cfg = sam.SamConfig(n_enc_state=64, n_enc_layer=2, n_enc_head=2,
                        n_enc_out_chans=32, n_pt_embd=4, n_dec_heads=4,
                        n_img_size=64, n_window_size=2, n_patch_size=16,
                        global_attn=(1,))
    rng = np.random.default_rng(11)
    return cfg, sam.synthetic_params(cfg, rng)


def test_encoder_shapes(tiny, rng):
    cfg, params = tiny
    img = jnp.asarray(rng.standard_normal((1, 3, 64, 64)).astype(np.float32))
    embd = sam.encode_image(cfg, params, img)
    assert embd.shape == (1, 32, 4, 4)
    assert np.isfinite(np.asarray(embd)).all()


def test_prompt_and_pe(tiny):
    cfg, params = tiny
    sparse, dense = sam.encode_prompt(cfg, params, (0.5, 0.25))
    assert sparse.shape == (2, 32) and dense.shape == (32, 4, 4)
    # row 1 is the not-a-point embedding verbatim
    np.testing.assert_array_equal(np.asarray(sparse[1]),
                                  np.asarray(params["not_a_pt"]))
    pe = sam.image_pe(cfg, params)
    assert pe.shape == (32, 4, 4)
    # Fourier features have unit amplitude per (sin, cos) pair
    s = np.asarray(pe).reshape(32, -1)
    np.testing.assert_allclose(s[:16] ** 2 + s[16:] ** 2, 1.0, rtol=1e-5)


def test_decode_mask_shapes(tiny, rng):
    cfg, params = tiny
    img = jnp.asarray(rng.standard_normal((1, 3, 64, 64)).astype(np.float32))
    embd = sam.encode_image(cfg, params, img)
    sparse, dense = sam.encode_prompt(cfg, params, (0.5, 0.5))
    masks, iou = sam.decode_mask(cfg, params, embd, sparse, dense,
                                 sam.image_pe(cfg, params))
    assert masks.shape == (3, 16, 16)            # 4 * n_img_embd, first dropped
    assert iou.shape == (3,)
    assert np.isfinite(np.asarray(masks)).all()


def test_predict_end_to_end(tiny, rng):
    cfg, params = tiny
    img = (rng.uniform(0, 255, (48, 64, 3))).astype(np.uint8)
    masks, iou = sam.predict(cfg, params, img, point_xy=(30, 20))
    assert masks.shape == (3, 48, 64) and masks.dtype == bool
    assert iou.shape == (3,)


def test_preprocess_normalization():
    cfg = sam.SamConfig(n_img_size=64)
    img = np.tile(sam.PIXEL_MEAN, (32, 64, 1)).astype(np.float32)
    x, (nh, nw) = sam.preprocess(img, cfg)
    assert x.shape == (1, 3, 64, 64) and (nh, nw) == (32, 64)
    # mean-valued image normalizes to 0; padding is 0 post-normalization
    np.testing.assert_allclose(np.asarray(x), 0.0, atol=1e-4)
    white = np.full((32, 64, 3), 255.0, np.float32)
    xw, _ = sam.preprocess(white, cfg)
    expect = np.broadcast_to(
        ((255.0 - sam.PIXEL_MEAN) / sam.PIXEL_STD)[:, None, None], (3, 32, 64))
    np.testing.assert_allclose(np.asarray(xw[0, :, :32, :]), expect, atol=1e-3)
    np.testing.assert_allclose(np.asarray(xw[0, :, 32:, :]), 0.0)


def test_sam_legacy_bin_loader_roundtrip(tiny, tmp_path):
    """Write a tiny SAM .bin (reference header format, no vocab section)
    from synthetic params and load it back through sam.load_legacy."""
    import struct
    from ggml_imax_tpu.io.legacy_bin import write_legacy_bin
    from ggml_imax_tpu.quant import codecs
    from ggml_imax_tpu.quant.formats import GGMLType

    cfg, params = tiny
    hp = {"n_enc_state": cfg.n_enc_state, "n_enc_layer": cfg.n_enc_layer,
          "n_enc_head": cfg.n_enc_head, "n_enc_out_chans": cfg.n_enc_out_chans,
          "n_pt_embd": cfg.n_pt_embd, "ftype": 0}

    tensors = {}

    def put(name, arr, ne=None):
        a = np.asarray(arr, np.float32)
        ne = ne or tuple(reversed(a.shape))
        tensors[name] = (GGMLType.F32, ne, np.ascontiguousarray(a))

    E, I, C = cfg.n_enc_state, cfg.n_img_embd, cfg.n_enc_out_chans
    put("image_encoder.pos_embed", np.asarray(params["pe"]))
    put("image_encoder.patch_embed.proj.weight", np.asarray(params["proj_w"]))
    put("image_encoder.patch_embed.proj.bias", np.asarray(params["proj_b"]))
    put("image_encoder.neck.0.weight", np.asarray(params["neck_conv0"]))
    put("image_encoder.neck.1.weight", np.asarray(params["neck_n0_g"]))
    put("image_encoder.neck.1.bias", np.asarray(params["neck_n0_b"]))
    put("image_encoder.neck.2.weight", np.asarray(params["neck_conv1"]))
    put("image_encoder.neck.3.weight", np.asarray(params["neck_n1_g"]))
    put("image_encoder.neck.3.bias", np.asarray(params["neck_n1_b"]))
    for i, lp in enumerate(params["enc_layers"]):
        pre = f"image_encoder.blocks.{i}"
        put(f"{pre}.norm1.weight", np.asarray(lp["n1_g"]))
        put(f"{pre}.norm1.bias", np.asarray(lp["n1_b"]))
        put(f"{pre}.attn.rel_pos_w", np.asarray(lp["rel_w"]))
        put(f"{pre}.attn.rel_pos_h", np.asarray(lp["rel_h"]))
        put(f"{pre}.attn.qkv.weight", np.asarray(lp["qkv_w"]).T)
        put(f"{pre}.attn.qkv.bias", np.asarray(lp["qkv_b"]))
        put(f"{pre}.attn.proj.weight", np.asarray(lp["proj_w"]).T)
        put(f"{pre}.attn.proj.bias", np.asarray(lp["proj_b"]))
        put(f"{pre}.norm2.weight", np.asarray(lp["n2_g"]))
        put(f"{pre}.norm2.bias", np.asarray(lp["n2_b"]))
        put(f"{pre}.mlp.lin1.weight", np.asarray(lp["mlp1_w"]).T)
        put(f"{pre}.mlp.lin1.bias", np.asarray(lp["mlp1_b"]))
        put(f"{pre}.mlp.lin2.weight", np.asarray(lp["mlp2_w"]).T)
        put(f"{pre}.mlp.lin2.bias", np.asarray(lp["mlp2_b"]))
    put("prompt_encoder.pe_layer.positional_encoding_gaussian_matrix",
        np.asarray(params["pe_gauss"]))
    put("prompt_encoder.not_a_point_embed.weight",
        np.asarray(params["not_a_pt"])[None])
    put("prompt_encoder.no_mask_embed.weight",
        np.asarray(params["no_mask"])[None])
    for i in range(cfg.n_pt_embd):
        put(f"prompt_encoder.point_embeddings.{i}.weight",
            np.asarray(params["pt_embd"][i])[None])
    dec = params["dec"]
    def puta(prefix, a):
        for k, n in [("q_w", "q_proj"), ("k_w", "k_proj"), ("v_w", "v_proj"),
                     ("o_w", "out_proj")]:
            put(f"{prefix}.{n}.weight", np.asarray(a[k]).T)
        for k, n in [("q_b", "q_proj"), ("k_b", "k_proj"), ("v_b", "v_proj"),
                     ("o_b", "out_proj")]:
            put(f"{prefix}.{n}.bias", np.asarray(a[k]))
    base = "mask_decoder.transformer.layers"
    for i, lp in enumerate(dec["layers"]):
        pre = f"{base}.{i}"
        puta(f"{pre}.self_attn", lp["self"])
        puta(f"{pre}.cross_attn_token_to_image", lp["t2i"])
        puta(f"{pre}.cross_attn_image_to_token", lp["i2t"])
        for j in (1, 2, 3, 4):
            put(f"{pre}.norm{j}.weight", np.asarray(lp[f"n{j}_g"]))
            put(f"{pre}.norm{j}.bias", np.asarray(lp[f"n{j}_b"]))
        put(f"{pre}.mlp.lin1.weight", np.asarray(lp["mlp1_w"]).T)
        put(f"{pre}.mlp.lin1.bias", np.asarray(lp["mlp1_b"]))
        put(f"{pre}.mlp.lin2.weight", np.asarray(lp["mlp2_w"]).T)
        put(f"{pre}.mlp.lin2.bias", np.asarray(lp["mlp2_b"]))
    puta("mask_decoder.transformer.final_attn_token_to_image", dec["final_t2i"])
    put("mask_decoder.transformer.norm_final_attn.weight", np.asarray(dec["nf_g"]))
    put("mask_decoder.transformer.norm_final_attn.bias", np.asarray(dec["nf_b"]))
    put("mask_decoder.output_upscaling.0.weight", np.asarray(dec["up0_w"]))
    put("mask_decoder.output_upscaling.0.bias", np.asarray(dec["up0_b"]))
    put("mask_decoder.output_upscaling.1.weight", np.asarray(dec["up1_g"]))
    put("mask_decoder.output_upscaling.1.bias", np.asarray(dec["up1_b"]))
    put("mask_decoder.output_upscaling.3.weight", np.asarray(dec["up3_w"]))
    put("mask_decoder.output_upscaling.3.bias", np.asarray(dec["up3_b"]))
    for i, m in enumerate(dec["hyper"]):
        for j, (w, b) in enumerate([("w0", "b0"), ("w1", "b1"), ("w2", "b2")]):
            put(f"mask_decoder.output_hypernetworks_mlps.{i}.layers.{j}.weight",
                np.asarray(m[w]).T)
            put(f"mask_decoder.output_hypernetworks_mlps.{i}.layers.{j}.bias",
                np.asarray(m[b]))
    for j, (w, b) in enumerate([("w0", "b0"), ("w1", "b1"), ("w2", "b2")]):
        put(f"mask_decoder.iou_prediction_head.layers.{j}.weight",
            np.asarray(dec["iou"][w]).T)
        put(f"mask_decoder.iou_prediction_head.layers.{j}.bias",
            np.asarray(dec["iou"][b]))
    put("mask_decoder.iou_token.weight", np.asarray(dec["iou_token"]))
    put("mask_decoder.mask_tokens.weight", np.asarray(dec["mask_tokens"]))

    path = tmp_path / "sam-tiny.bin"
    names = ["n_enc_state", "n_enc_layer", "n_enc_head", "n_enc_out_chans",
             "n_pt_embd", "ftype"]
    write_legacy_bin(path, hp, names, [], tensors, has_vocab=False)

    cfg2, p2 = sam.load_legacy(path)
    assert cfg2.n_enc_state == cfg.n_enc_state
    # loaded params must reproduce the original pipeline outputs
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.standard_normal((1, 3, 64, 64)).astype(np.float32))
    # loader cfg uses default img size 1024; drive encode at the tiny size
    # by calling with the tiny cfg but the LOADED params
    e1 = np.asarray(sam.encode_image(cfg, params, img))
    e2 = np.asarray(sam.encode_image(cfg, p2, img))
    np.testing.assert_allclose(e1, e2, rtol=2e-3, atol=2e-3)
