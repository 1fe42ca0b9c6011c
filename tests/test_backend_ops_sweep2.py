"""test-backend-ops sweep, part 2: rope / norms / get_rows / dispatch-m /
broadcast grids / sort / conv1d / pad families.

Extends tests/test_backend_ops_sweep.py toward the reference harness's
coverage (/root/reference/tests/test-backend-ops.cpp sweeps 91 case families
across types x shapes x broadcast patterns). References here are independent
numpy-f64 formulations (or torch CPU for the conv family), NOT jnp re-runs.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggml_imax_tpu.ops import tensor_ops as top
from ggml_imax_tpu.ops.conv import conv_1d, im2col, pad, upscale
from ggml_imax_tpu.ops.embedding import get_rows
from ggml_imax_tpu.ops.norms import group_norm, layer_norm, rms_norm
from ggml_imax_tpu.ops.rope import rope
from ggml_imax_tpu.ops.softmax import soft_max_ext
from ggml_imax_tpu.quant.device import dequantize_qtensor, quantize_for_device
from ggml_imax_tpu.quant.formats import GGMLType


@pytest.fixture()
def rng():
    return np.random.default_rng(20250817)


def nmse(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.mean((a - b) ** 2) / (np.mean(b * b) + 1e-300))


# ----------------------------------------------------------------- rope ----
def _rope_np(x, pos, n_dims, mode, freq_base=10000.0, freq_scale=1.0):
    """Independent f64 mirror of basic (no-YaRN) RoPE, both pair layouts."""
    x = np.asarray(x, np.float64)
    D = x.shape[-1]
    out = x.copy()
    ts = freq_base ** (-2.0 / n_dims)
    p = np.asarray(pos, np.float64)[..., None]          # (..., T, 1)
    if mode & 2:                                        # NeoX
        j = np.arange(n_dims // 2)
        # the reference applies freq_scale TWICE in NeoX mode (once at
        # ggml.c:13910 `theta_base *= freq_scale`, once inside rope_yarn
        # :13731) — a quirk reproduced faithfully by ops/rope.py
        th = (p * freq_scale * freq_scale) * ts ** j    # (..., T, nd/2)
        cos, sin = np.cos(th)[..., None, :], np.sin(th)[..., None, :]
        x0 = x[..., : n_dims // 2]
        x1 = x[..., n_dims // 2: n_dims]
        out[..., : n_dims // 2] = x0 * cos - x1 * sin
        out[..., n_dims // 2: n_dims] = x0 * sin + x1 * cos
        return out
    i = np.arange(D // 2)
    th = (p * freq_scale) * ts ** i                     # normal mode: once
    cos, sin = np.cos(th)[..., None, :], np.sin(th)[..., None, :]
    x0, x1 = x[..., 0::2], x[..., 1::2]
    out[..., 0::2] = x0 * cos - x1 * sin
    out[..., 1::2] = x0 * sin + x1 * cos
    return out


@pytest.mark.parametrize("mode", [0, 2])
@pytest.mark.parametrize("n_dims", [16, 32])
@pytest.mark.parametrize("freq_scale", [1.0, 0.5])
@pytest.mark.parametrize("t", [1, 7])
def test_rope_sweep(rng, mode, n_dims, freq_scale, t):
    if mode == 0 and n_dims != 32:
        pytest.skip("normal mode rotates the full head dim")
    x = rng.standard_normal((2, t, 3, 32)).astype(np.float32)
    pos = rng.integers(0, 100, (2, t)).astype(np.int32)
    got = rope(jnp.asarray(x), jnp.asarray(pos), n_dims, mode,
               freq_scale=freq_scale)
    ref = _rope_np(x, pos, n_dims, mode, freq_scale=freq_scale)
    assert nmse(got, ref) < 1e-9, nmse(got, ref)


def test_rope_backward_consistency(rng):
    """rope(forward=False) inverts rope(forward=True) (the ROPE_BACK
    contract, reference ggml.c rope_back)."""
    x = rng.standard_normal((1, 5, 2, 32)).astype(np.float32)
    pos = jnp.asarray(np.arange(5, dtype=np.int32)[None])
    y = rope(jnp.asarray(x), pos, 32, 0)
    back = rope(y, pos, 32, 0, forward=False)
    assert nmse(back, x) < 1e-10


# ---------------------------------------------------------------- norms ----
@pytest.mark.parametrize("shape", [(2, 3, 16), (1, 64), (4, 1, 1, 32)])
@pytest.mark.parametrize("affine", [False, True])
def test_layer_norm_sweep(rng, shape, affine):
    x = (rng.standard_normal(shape) * 3).astype(np.float32)
    w = rng.standard_normal(shape[-1]).astype(np.float32) if affine else None
    b = rng.standard_normal(shape[-1]).astype(np.float32) if affine else None
    xf = np.asarray(x, np.float64)
    ref = (xf - xf.mean(-1, keepdims=True)) / \
        np.sqrt(xf.var(-1, keepdims=True) + 1e-5)
    if affine:
        ref = ref * w + b
    got = layer_norm(jnp.asarray(x), None if w is None else jnp.asarray(w),
                     None if b is None else jnp.asarray(b), eps=1e-5)
    assert nmse(got, ref) < 1e-9


@pytest.mark.parametrize("shape", [(2, 3, 16), (1, 64), (4, 2, 32)])
def test_rms_norm_sweep(rng, shape):
    x = (rng.standard_normal(shape) * 3).astype(np.float32)
    xf = np.asarray(x, np.float64)
    ref = xf / np.sqrt(np.mean(xf * xf, -1, keepdims=True) + 1e-5)
    got = rms_norm(jnp.asarray(x), eps=1e-5)
    assert nmse(got, ref) < 1e-9


@pytest.mark.parametrize("groups", [1, 2, 4])
def test_group_norm_sweep(rng, groups):
    # ggml group_norm layout (..., C, S): normalize per (group, spatial)
    x = (rng.standard_normal((2, 8, 30)) * 2).astype(np.float32)
    got = np.asarray(group_norm(jnp.asarray(x), groups, eps=1e-6))
    xf = np.asarray(x, np.float64).reshape(2, groups, -1)
    ref = (xf - xf.mean(-1, keepdims=True)) / \
        np.sqrt(xf.var(-1, keepdims=True) + 1e-6)
    assert nmse(got, ref.reshape(x.shape)) < 1e-9


# -------------------------------------------------------------- get_rows ----
ALL_TYPES = ["Q4_0", "Q4_1", "Q5_0", "Q5_1", "Q8_0", "Q2_K", "Q3_K",
             "Q4_K", "Q5_K", "Q6_K", "IQ4_NL", "IQ4_XS"]


@pytest.mark.parametrize("t", ALL_TYPES)
def test_get_rows_type_sweep(rng, t):
    w = (rng.standard_normal((256, 32)) * 0.4).astype(np.float32)
    qt = quantize_for_device(w, getattr(GGMLType, t))
    ref = dequantize_qtensor(qt).T                    # (vocab, K)
    ids = jnp.asarray(np.array([0, 31, 7, 7, 15]))
    rows = np.asarray(get_rows(qt, ids, dtype=jnp.float32))
    assert np.abs(rows - ref[np.asarray(ids)]).max() < 1e-6


# ------------------------------------------------- qmatmul dispatch by m ----
@pytest.mark.parametrize("t", ["Q4_0", "Q4_1", "Q8_0", "Q6_K"])
@pytest.mark.parametrize("m", [1, 2, 8, 64, 513])
def test_qmatmul_m_dispatch_sweep(rng, t, m):
    """Crosses every dispatch boundary: W4A8/W8A8 at m=1, full-tile W4A16/
    W8A16 above, and the m-grid beyond DEFAULT_BM=512 — all vs the XLA
    dequant reference (interpret-mode kernels on CPU)."""
    from ggml_imax_tpu.ops.pallas_qmm import (params_repack_device,
                                              qmatmul_pallas)
    w = (rng.standard_normal((512, 256)) * 0.4).astype(np.float32)
    qt = quantize_for_device(w, getattr(GGMLType, t))
    ref_w = dequantize_qtensor(qt)
    qtr = params_repack_device({"w": qt})["w"]
    x = (rng.standard_normal((m, 512)) * 0.5).astype(np.float32)
    got = np.asarray(qmatmul_pallas(jnp.asarray(x), qtr))
    assert nmse(got, x @ ref_w) < 1e-4, (t, m, nmse(got, x @ ref_w))


# --------------------------------------------------------- broadcast grid ----
BCAST_SHAPES = [
    ((2, 3, 4, 5), (1, 1, 1, 1)),
    ((2, 3, 4, 5), (1, 3, 1, 5)),
    ((2, 3, 4, 5), (2, 1, 4, 1)),
    ((1, 1, 8, 128), (1, 1, 1, 128)),
    ((4, 1, 6), (1, 5, 1)),
]
BOPS = {"add": np.add, "mul": np.multiply, "sub": np.subtract,
        "div": np.divide}


@pytest.mark.parametrize("op", sorted(BOPS))
@pytest.mark.parametrize("si", range(len(BCAST_SHAPES)))
def test_binary_broadcast_grid(rng, op, si):
    sa, sb = BCAST_SHAPES[si]
    a = rng.standard_normal(sa).astype(np.float32)
    b = (rng.standard_normal(sb).astype(np.float32) + 3.0)  # div-safe
    got = getattr(jnp, {"add": "add", "mul": "multiply", "sub": "subtract",
                        "div": "divide"}[op])(jnp.asarray(a), jnp.asarray(b))
    ref = BOPS[op](np.asarray(a, np.float64), np.asarray(b, np.float64))
    assert nmse(got, ref) < 1e-12


# ------------------------------------------------------------ sort / sel ----
@pytest.mark.parametrize("desc", [False, True])
@pytest.mark.parametrize("n", [1, 7, 128])
def test_argsort_sweep(rng, desc, n):
    x = rng.standard_normal((3, n)).astype(np.float32)
    got = np.asarray(top.argsort(jnp.asarray(x), descending=desc))
    ref = np.argsort(-x if desc else x, axis=-1, kind="stable")
    gathered = np.take_along_axis(x, got, -1)
    want = np.take_along_axis(x, ref, -1)
    np.testing.assert_array_equal(gathered, want)


@pytest.mark.parametrize("k", [1, 3, 16])
def test_top_k_sweep(rng, k):
    x = rng.standard_normal((2, 32)).astype(np.float32)
    idx = np.asarray(top.top_k(jnp.asarray(x), k))
    vals = np.take_along_axis(x, idx, -1)
    want = np.sort(x, axis=-1)[:, ::-1][:, :k]
    np.testing.assert_allclose(vals, want)


def test_argmax_and_reductions(rng):
    x = rng.standard_normal((4, 33)).astype(np.float32)
    assert np.array_equal(np.asarray(top.argmax(jnp.asarray(x))),
                          np.argmax(x, -1))
    assert nmse(top.sum_rows(jnp.asarray(x)),
                x.astype(np.float64).sum(-1, keepdims=True)) < 1e-12
    assert nmse(top.mean(jnp.asarray(x)),
                x.astype(np.float64).mean(-1, keepdims=True)) < 1e-12


@pytest.mark.parametrize("n_past", [0, 2, 5])
def test_diag_mask_sweep(rng, n_past):
    x = rng.standard_normal((2, 6, 6)).astype(np.float32)
    got = np.asarray(top.diag_mask_inf(jnp.asarray(x), n_past))
    for r in range(6):
        for c in range(6):
            if c > n_past + r:
                assert np.all(np.isinf(got[:, r, c]))
            else:
                np.testing.assert_array_equal(got[:, r, c], x[:, r, c])


# ----------------------------------------------------------------- conv ----
torch = pytest.importorskip("torch")


@pytest.mark.parametrize("s0", [1, 2])
@pytest.mark.parametrize("p0", [0, 2])
@pytest.mark.parametrize("d0", [1, 2])
def test_conv1d_grid_vs_torch(rng, s0, p0, d0):
    x = rng.standard_normal((1, 4, 20)).astype(np.float32)   # (N, Cin, L)
    w = rng.standard_normal((6, 4, 3)).astype(np.float32)    # (Cout, Cin, K)
    got = np.asarray(conv_1d(jnp.asarray(x), jnp.asarray(w), s0, p0, d0))
    with torch.no_grad():
        ref = torch.nn.functional.conv1d(
            torch.from_numpy(x), torch.from_numpy(w),
            stride=s0, padding=p0, dilation=d0).numpy()
    assert nmse(got, ref) < 1e-10, nmse(got, ref)


@pytest.mark.parametrize("s", [1, 2])
@pytest.mark.parametrize("p", [0, 1])
def test_im2col_matmul_equals_conv2d(rng, s, p):
    """im2col + matmul must equal direct conv2d (the reference's conv2d IS
    im2col+GEMM, ggml.c ggml_conv_2d)."""
    from ggml_imax_tpu.ops.conv import conv_2d
    x = rng.standard_normal((1, 3, 8, 9)).astype(np.float32)
    w = rng.standard_normal((5, 3, 3, 3)).astype(np.float32)
    direct = np.asarray(conv_2d(jnp.asarray(x), jnp.asarray(w),
                                s0=s, s1=s, p0=p, p1=p))
    cols = np.asarray(im2col(jnp.asarray(x), 3, 3, s0=s, s1=s, p0=p, p1=p))
    oh, ow = direct.shape[-2:]
    via = cols.reshape(1, oh * ow, -1) @ w.reshape(5, -1).T
    via = via.transpose(0, 2, 1).reshape(1, 5, oh, ow)
    assert nmse(direct, via) < 1e-10


def test_pad_and_upscale(rng):
    x = rng.standard_normal((1, 2, 3, 4)).astype(np.float32)
    # ggml_pad: trailing widths, innermost axis first
    got = np.asarray(pad(jnp.asarray(x), 3, 2, 1))
    ref = np.pad(x, ((0, 0), (0, 1), (0, 2), (0, 3)))
    np.testing.assert_array_equal(got, ref)
    up = np.asarray(upscale(jnp.asarray(x), 2))
    ref_up = x.repeat(2, axis=-2).repeat(2, axis=-1)
    np.testing.assert_array_equal(up, ref_up)


# ------------------------------------------------------------- softmax -----
def test_softmax_fully_masked_rows_no_nan(rng):
    """A fully -inf-masked row must produce zeros, not NaN (the reference's
    soft_max handles max = -inf rows; NaN checks test-backend-ops.cpp:460)."""
    x = rng.standard_normal((1, 2, 3, 8)).astype(np.float32)
    mask = np.full((1, 1, 3, 8), -np.inf, np.float32)
    out = np.asarray(soft_max_ext(jnp.asarray(x), jnp.asarray(mask)))
    assert not np.any(np.isnan(out))
    np.testing.assert_array_equal(out, np.zeros_like(out))


def test_timestep_embedding_numpy_mirror(rng):
    ts = np.array([0.0, 1.0, 17.5], np.float32)
    dim = 16
    got = np.asarray(top.timestep_embedding(jnp.asarray(ts), dim))
    half = dim // 2
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = ts[:, None].astype(np.float64) * freqs[None]
    ref = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    assert nmse(got, ref) < 1e-9
