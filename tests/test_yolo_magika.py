"""YOLOv3-tiny and Magika model tests (shape + decode semantics; the
reference validates these examples via fixed-input CI runs, ci/run.sh)."""
import numpy as np
import pytest

import jax.numpy as jnp

from ggml_imax_tpu.models import magika, yolo


def test_yolo_forward_shapes(rng):
    params = yolo.synthetic_params(rng, n_classes=80, width=4)
    x = jnp.asarray(rng.standard_normal((1, 3, 416, 416)).astype(np.float32))
    h16, h23 = yolo.forward(params, x)
    assert h16.shape == (1, 255, 13, 13)         # 3*(5+80) at stride 32
    assert h23.shape == (1, 255, 26, 26)         # stride 16 after upscale


def test_yolo_decode_and_nms():
    h, w, ncls = 13, 13, 80
    pred = np.full((3 * (5 + ncls), h, w), -10.0, np.float32)
    p = pred.reshape(3, 5 + ncls, h, w)
    # plant one confident box at anchor 0, cell (6, 6)
    p[0, 0, 6, 6] = 0.0       # tx -> sigmoid 0.5
    p[0, 1, 6, 6] = 0.0
    p[0, 2, 6, 6] = 0.0       # tw -> exp(0)=1
    p[0, 3, 6, 6] = 0.0
    p[0, 4, 6, 6] = 10.0      # objectness ~1
    p[0, 5 + 3, 6, 6] = 10.0  # class 3
    # overlapping duplicate at the same cell, slightly less confident:
    # anchor 4 with tw/th chosen to reproduce anchor 3's box dims
    p[1, 0, 6, 6] = 0.0
    p[1, 1, 6, 6] = 0.0
    p[1, 2, 6, 6] = np.log(yolo.ANCHORS[6] / yolo.ANCHORS[8])
    p[1, 3, 6, 6] = np.log(yolo.ANCHORS[7] / yolo.ANCHORS[9])
    p[1, 4, 6, 6] = 5.0
    p[1, 5 + 3, 6, 6] = 5.0

    dets = yolo.decode_head(pred, yolo.MASK_16, thresh=0.5)
    assert len(dets) == 2
    cx = (6 + 0.5) / 13
    best = max(dets, key=lambda d: d.objectness)
    np.testing.assert_allclose(best.box[0], cx, atol=1e-6)
    np.testing.assert_allclose(best.box[2], yolo.ANCHORS[2 * 3] / 416, rtol=1e-5)
    assert np.argmax(best.prob) == 3

    yolo.nms(dets, 0.45)
    kept = [d for d in dets if d.prob[3] > 0]
    assert len(kept) == 1 and kept[0] is best    # duplicate suppressed


def test_yolo_letterbox():
    img = np.ones((3, 200, 400), np.float32)
    out = np.asarray(yolo.letterbox(img))
    assert out.shape == (3, 416, 416)
    assert np.allclose(out[:, 0, :], 0.5)        # top padding
    assert np.allclose(out[:, 208, :], 1.0)      # center row is image


def test_yolo_bn_folding_matches_reference_order(rng, tmp_path):
    """BN folded at load == the reference's sub/div/mul/add chain."""
    from ggml_imax_tpu.io.gguf import GGUFWriter
    from ggml_imax_tpu.ops.conv import conv_2d
    cout, cin = 4, 3
    w = rng.standard_normal((cout, cin, 3, 3)).astype(np.float32)
    b = rng.standard_normal(cout).astype(np.float32)
    sc = rng.uniform(0.5, 2, cout).astype(np.float32)
    mean = rng.standard_normal(cout).astype(np.float32)
    var = rng.uniform(0.5, 2, cout).astype(np.float32)
    gw = GGUFWriter(tmp_path / "y.gguf")
    from ggml_imax_tpu.quant.formats import GGMLType
    for i in range(13):
        pad, bn, act = yolo.LAYER_CFG[i]
        gw.add_tensor(f"l{i}_weights", w, GGMLType.F32, shape=(3, 3, cin, cout))
        gw.add_tensor(f"l{i}_biases", b, GGMLType.F32, shape=(cout,))
        if bn:
            gw.add_tensor(f"l{i}_scales", sc, GGMLType.F32, shape=(cout,))
            gw.add_tensor(f"l{i}_rolling_mean", mean, GGMLType.F32, shape=(cout,))
            gw.add_tensor(f"l{i}_rolling_variance", var, GGMLType.F32, shape=(cout,))
    gw.write()
    params = yolo.load_gguf(tmp_path / "y.gguf")
    x = jnp.asarray(rng.standard_normal((1, cin, 8, 8)).astype(np.float32))
    got = np.asarray(conv_2d(x, params[0]["w"], p0=1, p1=1)
                     + np.asarray(params[0]["b"])[None, :, None, None])
    raw = np.asarray(conv_2d(x, jnp.asarray(w), p0=1, p1=1))
    ref = (raw - mean[None, :, None, None]) / np.sqrt(var)[None, :, None, None]
    ref = ref * sc[None, :, None, None] + b[None, :, None, None]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_magika_forward_and_identify(rng):
    params = magika.synthetic_params(rng)
    toks = magika.file_tokens(b"#!/bin/sh\necho hello\n" * 10)
    assert toks.shape == (1536,)
    assert toks.max() <= magika.PAD_TOKEN
    probs = np.asarray(magika.forward(params, jnp.asarray(toks[None])))
    assert probs.shape == (1, len(magika.LABELS))
    np.testing.assert_allclose(probs.sum(), 1.0, rtol=1e-5)
    top = magika.identify(params, b"PK\x03\x04" + bytes(100))
    assert len(top) == 5 and all(isinstance(n, str) for n, _ in top)


def test_magika_file_tokens_padding():
    toks = magika.file_tokens(b"AB")
    assert toks[0] == ord("A") and toks[1] == ord("B")
    assert toks[2] == magika.PAD_TOKEN               # beg padding
    assert toks[-1] == ord("B") and toks[-2] == ord("A")   # end window
    assert (toks == magika.PAD_TOKEN).sum() == 1536 - 4 - 2  # mid contains AB


def test_magika_gguf_loader(tmp_path, rng):
    from ggml_imax_tpu.io.gguf import GGUFWriter
    from ggml_imax_tpu.quant.formats import GGMLType
    params = magika.synthetic_params(rng)
    w = GGUFWriter(tmp_path / "magika.gguf")
    names = {
        "dense_w": "dense/kernel:0", "dense_b": "dense/bias:0",
        "ln_g": "layer_normalization/gamma:0",
        "ln_b": "layer_normalization/beta:0",
        "dense1_w": "dense_1/kernel:0", "dense1_b": "dense_1/bias:0",
        "dense2_w": "dense_2/kernel:0", "dense2_b": "dense_2/bias:0",
        "ln1_g": "layer_normalization_1/gamma:0",
        "ln1_b": "layer_normalization_1/beta:0",
        "label_w": "target_label/kernel:0", "label_b": "target_label/bias:0",
    }
    for k, n in names.items():
        a = np.asarray(params[k], np.float32)
        w.add_tensor(n, a, GGMLType.F32, shape=tuple(reversed(a.shape)))
    w.write()
    p2 = magika.load_gguf(tmp_path / "magika.gguf")
    toks = magika.file_tokens(b"#!/bin/sh\n")
    import jax.numpy as jnp
    a = np.asarray(magika.forward(params, jnp.asarray(toks[None])))
    b = np.asarray(magika.forward(p2, jnp.asarray(toks[None])))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
