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
