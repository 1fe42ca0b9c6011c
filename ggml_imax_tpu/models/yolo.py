"""YOLOv3-tiny object detection.

Reference: examples/yolo in /root/reference — network wiring
yolov3-tiny.cpp:368-436 (13 conv layers, maxpools, a stride-1 "same"
maxpool, upscale + route concat, two YOLO heads), conv block
apply_conv2d :133-145 (conv -> batchnorm (sub mean, div sqrt var, mul
scale) -> bias -> leaky_relu 0.1), box decode get_yolo_detections
:160-230, NMS do_nms_sort :262-300. Weights load from GGUF with names
l{i}_weights/... (:63-100).

TPU-native: batch-norm folds into the conv weights at load time (one
multiply-add saved per activation; bit-identical math re-associated), the
whole backbone is one jitted function, and detection decode runs on host
numpy (tiny)."""
from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..io.gguf import GGUFReader
from ..ops.activations import leaky_relu
from ..ops.conv import conv_2d, pool_2d, upscale

ANCHORS = (10, 14, 23, 27, 37, 58, 81, 82, 135, 169, 344, 319)
MASK_16 = (3, 4, 5)
MASK_23 = (0, 1, 2)
N_CLASSES = 80
NET_W = NET_H = 416

# layer config: (padding, batch_normalize, activate) — yolov3-tiny.cpp:74-82
LAYER_CFG = {i: (1, True, True) for i in range(13)}
LAYER_CFG[7] = (0, True, True)
LAYER_CFG[9] = (0, False, False)
LAYER_CFG[10] = (0, True, True)
LAYER_CFG[12] = (0, False, False)


def load_gguf(path: str | Path):
    """-> params list of 13 dicts {w (Cout,Cin,KH,KW) f32 BN-folded, b}."""
    layers = []
    with GGUFReader(path) as r:
        for i in range(13):
            pad, bn, act = LAYER_CFG[i]
            w = r.tensor_array(f"l{i}_weights").astype(np.float32)
            b = r.tensor_array(f"l{i}_biases").astype(np.float32)
            if bn:
                scales = r.tensor_array(f"l{i}_scales").astype(np.float32)
                mean = r.tensor_array(f"l{i}_rolling_mean").astype(np.float32)
                var = r.tensor_array(f"l{i}_rolling_variance").astype(np.float32)
                g = scales / np.sqrt(var)
                w = w * g[:, None, None, None]
                b = b - mean * g
            layers.append({"w": jnp.asarray(w), "b": jnp.asarray(b)})
    return layers


def synthetic_params(rng: np.random.Generator, n_classes: int = N_CLASSES,
                     width: int = 16):
    """Random weights at a scaled-down geometry (channel base `width`
    instead of 16..1024) for tests."""
    chans = [3, width, width * 2, width * 4, width * 8, width * 16,
             width * 32, width * 64]
    cfg = []
    # (cin, cout, k) per layer following the tiny backbone
    seq = [(chans[0], chans[1], 3), (chans[1], chans[2], 3),
           (chans[2], chans[3], 3), (chans[3], chans[4], 3),
           (chans[4], chans[5], 3), (chans[5], chans[6], 3),
           (chans[6], chans[7], 3), (chans[7], chans[5], 1),
           (chans[5], chans[6], 3), (chans[6], 3 * (5 + n_classes), 1),
           (chans[5], chans[4], 1),
           (chans[4] + chans[5], chans[6], 3),
           (chans[6], 3 * (5 + n_classes), 1)]
    out = []
    for cin, cout, k in seq:
        out.append({"w": jnp.asarray((rng.standard_normal((cout, cin, k, k))
                                      * 0.05).astype(np.float32)),
                    "b": jnp.asarray(np.zeros(cout, np.float32))})
    return out


def _block(x, lp, i):
    pad, _bn, act = LAYER_CFG[i]
    y = conv_2d(x, lp["w"], p0=pad, p1=pad) + lp["b"][None, :, None, None]
    return leaky_relu(y, 0.1) if act else y


def forward(params, x):
    """x: (N, 3, H, W) in [0,1] letterboxed -> (head16, head23) raw
    prediction maps (N, 3*(5+classes), h, w). Wiring yolov3-tiny.cpp:376-421."""
    r = _block(x, params[0], 0)
    r = pool_2d(r, "max", 2, 2, 2, 2)
    r = _block(r, params[1], 1)
    r = pool_2d(r, "max", 2, 2, 2, 2)
    r = _block(r, params[2], 2)
    r = pool_2d(r, "max", 2, 2, 2, 2)
    r = _block(r, params[3], 3)
    r = pool_2d(r, "max", 2, 2, 2, 2)
    r = _block(r, params[4], 4)
    layer_8 = r
    r = pool_2d(r, "max", 2, 2, 2, 2)
    r = _block(r, params[5], 5)
    # stride-1 "same" maxpool (darknet size-2/stride-1; ggml p=0.5):
    # pad right/bottom with -inf, pool k2 s1
    r = jnp.pad(r, ((0, 0), (0, 0), (0, 1), (0, 1)),
                constant_values=-jnp.inf)
    r = pool_2d(r, "max", 2, 2, 1, 1)
    r = _block(r, params[6], 6)
    r = _block(r, params[7], 7)
    layer_13 = r
    r = _block(r, params[8], 8)
    head16 = _block(r, params[9], 9)
    r = _block(layer_13, params[10], 10)
    r = upscale(r, 2)
    r = jnp.concatenate([r, layer_8], axis=1)      # route concat (channels)
    r = _block(r, params[11], 11)
    head23 = _block(r, params[12], 12)
    return head16, head23


# ---- host-side detection decode (get_yolo_detections + NMS) ----

@dataclass
class Detection:
    box: tuple          # (x, y, w, h) normalized to image
    objectness: float
    prob: np.ndarray    # per-class score


def decode_head(pred, mask, *, thresh=0.5, net_w=NET_W, net_h=NET_H,
                im_w=None, im_h=None, n_classes=N_CLASSES):
    """pred: (3*(5+classes), h, w) raw map -> detections
    (apply_yolo sigmoids + get_yolo_detections box math)."""
    im_w = im_w or net_w
    im_h = im_h or net_h
    c, h, w = pred.shape
    p = np.asarray(pred, np.float32).reshape(3, 5 + n_classes, h, w)
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))
    dets = []
    for n in range(3):
        tx, ty, tw, th = p[n, 0], p[n, 1], p[n, 2], p[n, 3]
        obj = sig(p[n, 4])
        cls = sig(p[n, 5:])
        aw, ah = ANCHORS[2 * mask[n]], ANCHORS[2 * mask[n] + 1]
        ys, xs = np.nonzero(obj > thresh)
        for yy, xx in zip(ys, xs):
            bx = (xx + sig(tx[yy, xx])) / w
            by = (yy + sig(ty[yy, xx])) / h
            bw = np.exp(tw[yy, xx]) * aw / net_w
            bh = np.exp(th[yy, xx]) * ah / net_h
            b = _correct_box((bx, by, bw, bh), im_w, im_h, net_w, net_h)
            probs = obj[yy, xx] * cls[:, yy, xx]
            probs[probs < thresh] = 0.0
            dets.append(Detection(b, float(obj[yy, xx]), probs))
    return dets


def _correct_box(b, im_w, im_h, net_w, net_h):
    """Undo letterboxing (correct_yolo_box, yolov3-tiny.cpp:181-196)."""
    bx, by, bw, bh = b
    if net_w / im_w < net_h / im_h:
        new_w, new_h = net_w, (im_h * net_w) // im_w
    else:
        new_h, new_w = net_h, (im_w * net_h) // im_h
    bx = (bx - (net_w - new_w) / 2.0 / net_w) / (new_w / net_w)
    by = (by - (net_h - new_h) / 2.0 / net_h) / (new_h / net_h)
    bw *= net_w / new_w
    bh *= net_h / new_h
    return (bx, by, bw, bh)


def _iou(a, b):
    def inter1d(ax, aw, bx, bw):
        lo = max(ax - aw / 2, bx - bw / 2)
        hi = min(ax + aw / 2, bx + bw / 2)
        return max(0.0, hi - lo)

    iw = inter1d(a[0], a[2], b[0], b[2])
    ih = inter1d(a[1], a[3], b[1], b[3])
    inter = iw * ih
    union = a[2] * a[3] + b[2] * b[3] - inter
    return inter / union if union > 0 else 0.0


def nms(dets, iou_thresh=0.45):
    """Per-class greedy NMS (do_nms_sort, yolov3-tiny.cpp:262-300):
    suppressed detections get prob[k] = 0 (kept in the list)."""
    if not dets:
        return dets
    n_cls = len(dets[0].prob)
    for k in range(n_cls):
        order = sorted(range(len(dets)), key=lambda i: -dets[i].prob[k])
        for ii, i in enumerate(order):
            if dets[i].prob[k] == 0:
                continue
            for j in order[ii + 1:]:
                if _iou(dets[i].box, dets[j].box) > iou_thresh:
                    dets[j].prob[k] = 0.0
    return dets


def letterbox(img, net_w=NET_W, net_h=NET_H):
    """img: (3, H, W) float [0,1] -> (3, net_h, net_w) aspect-preserving
    resize padded with 0.5 (yolo-image.cpp letterbox_image)."""
    _, h, w = img.shape
    if net_w / w < net_h / h:
        new_w, new_h = net_w, int(h * net_w / w)
    else:
        new_h, new_w = net_h, int(w * net_h / h)
    resized = jax.image.resize(jnp.asarray(img), (3, new_h, new_w), "bilinear")
    out = jnp.full((3, net_h, net_w), 0.5, jnp.float32)
    dy, dx = (net_h - new_h) // 2, (net_w - new_w) // 2
    return out.at[:, dy:dy + new_h, dx:dx + new_w].set(resized)


def detect(params, img, *, thresh=0.5, nms_thresh=0.45,
           n_classes=N_CLASSES):
    """Full pipeline: letterbox -> backbone -> decode both heads -> NMS."""
    _, im_h, im_w = img.shape
    x = letterbox(img)[None]
    h16, h23 = jax.jit(forward)(params, x)
    dets = decode_head(np.asarray(h16[0]), MASK_16, thresh=thresh,
                       im_w=im_w, im_h=im_h, n_classes=n_classes)
    dets += decode_head(np.asarray(h23[0]), MASK_23, thresh=thresh,
                        im_w=im_w, im_h=im_h, n_classes=n_classes)
    return nms(dets, nms_thresh)
