"""Differential tests for the extended op set (conv / pooling / misc / ssm)
against naive numpy references — the test-backend-ops strategy (SURVEY.md §4)
where the naive implementation plays the CPU-reference role.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from ggml_imax_tpu.ops import conv as C
from ggml_imax_tpu.ops import ssm as S
from ggml_imax_tpu.ops import tensor_ops as T


def naive_conv1d(x, w, s, p, d):
    n, cin, L = x.shape
    cout, _, k = w.shape
    xp = np.pad(x, ((0, 0), (0, 0), (p, p)))
    ol = (L + 2 * p - d * (k - 1) - 1) // s + 1
    out = np.zeros((n, cout, ol), np.float32)
    for i in range(ol):
        for j in range(k):
            out[:, :, i] += np.einsum("nc,oc->no", xp[:, :, i * s + j * d], w[:, :, j])
    return out


@pytest.mark.parametrize("s,p,d", [(1, 0, 1), (2, 1, 1), (1, 2, 2)])
def test_conv_1d(rng, s, p, d):
    x = rng.standard_normal((2, 3, 20)).astype(np.float32)
    w = rng.standard_normal((5, 3, 3)).astype(np.float32)
    ref = naive_conv1d(x, w, s, p, d)
    got = np.asarray(C.conv_1d(jnp.asarray(x), jnp.asarray(w), s, p, d))
    np.testing.assert_allclose(ref, got, rtol=1e-4, atol=1e-4)


def test_conv_2d_vs_torch(rng):
    import torch
    x = rng.standard_normal((2, 3, 12, 14)).astype(np.float32)
    w = rng.standard_normal((4, 3, 3, 5)).astype(np.float32)
    ref = torch.nn.functional.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                                     stride=(2, 1), padding=(1, 2),
                                     dilation=(1, 2)).numpy()
    # ggml order: (s0,p0,d0) on W, (s1,p1,d1) on H
    got = np.asarray(C.conv_2d(jnp.asarray(x), jnp.asarray(w),
                               s0=1, s1=2, p0=2, p1=1, d0=2, d1=1))
    np.testing.assert_allclose(ref, got, rtol=1e-4, atol=1e-4)


def test_conv_transpose_1d_vs_torch(rng):
    import torch
    x = rng.standard_normal((1, 4, 9)).astype(np.float32)
    w = rng.standard_normal((4, 6, 3)).astype(np.float32)  # (Cin, Cout, K)
    ref = torch.nn.functional.conv_transpose1d(
        torch.from_numpy(x), torch.from_numpy(w), stride=2).numpy()
    got = np.asarray(C.conv_transpose_1d(jnp.asarray(x), jnp.asarray(w), s0=2))
    np.testing.assert_allclose(ref, got, rtol=1e-4, atol=1e-4)


def test_conv_transpose_2d_vs_torch(rng):
    import torch
    x = rng.standard_normal((1, 3, 5, 6)).astype(np.float32)
    w = rng.standard_normal((3, 4, 3, 3)).astype(np.float32)
    ref = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), stride=2).numpy()
    got = np.asarray(C.conv_transpose_2d_p0(jnp.asarray(x), jnp.asarray(w), 2))
    np.testing.assert_allclose(ref, got, rtol=1e-4, atol=1e-4)


def test_im2col_matches_conv(rng):
    x = rng.standard_normal((2, 3, 10, 11)).astype(np.float32)
    w = rng.standard_normal((4, 3, 3, 3)).astype(np.float32)
    patches = np.asarray(C.im2col(jnp.asarray(x), 3, 3, s0=1, s1=1, p0=1, p1=1))
    via_gemm = patches @ w.reshape(4, -1).T            # (N, OH, OW, Cout)
    direct = np.asarray(C.conv_2d(jnp.asarray(x), jnp.asarray(w), p0=1, p1=1))
    np.testing.assert_allclose(via_gemm.transpose(0, 3, 1, 2), direct,
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("op", ["max", "avg"])
def test_pool_2d_vs_torch(rng, op):
    import torch
    x = rng.standard_normal((2, 3, 8, 10)).astype(np.float32)
    tf = (torch.nn.functional.max_pool2d if op == "max"
          else torch.nn.functional.avg_pool2d)
    ref = tf(torch.from_numpy(x), kernel_size=2, stride=2).numpy()
    got = np.asarray(C.pool_2d(jnp.asarray(x), op, k0=2, k1=2, s0=2, s1=2))
    np.testing.assert_allclose(ref, got, rtol=1e-5, atol=1e-5)


def test_upscale_and_pad(rng):
    x = rng.standard_normal((1, 2, 3, 4)).astype(np.float32)
    up = np.asarray(C.upscale(jnp.asarray(x), 2))
    assert up.shape == (1, 2, 6, 8)
    assert np.all(up[0, 0, 0:2, 0:2] == x[0, 0, 0, 0])
    p = np.asarray(C.pad(jnp.asarray(x), 3, 1))        # p0 on W, p1 on H
    assert p.shape == (1, 2, 4, 7)
    assert np.all(p[:, :, 3:, :] == 0) and np.all(p[:, :, :, 4:] == 0)


def test_argsort_topk(rng):
    x = rng.standard_normal((4, 17)).astype(np.float32)
    asc = np.asarray(T.argsort(jnp.asarray(x)))
    np.testing.assert_array_equal(asc, np.argsort(x, -1, kind="stable"))
    tk = np.asarray(T.top_k(jnp.asarray(x), 5))
    np.testing.assert_array_equal(np.sort(tk, -1),
                                  np.sort(np.argsort(-x, -1)[:, :5], -1))


def test_diag_mask_and_sums(rng):
    x = rng.standard_normal((2, 4, 6)).astype(np.float32)
    m = np.asarray(T.diag_mask_inf(jnp.asarray(x), 1))
    assert np.isneginf(m[0, 0, 2]) and m[0, 0, 1] == x[0, 0, 1]
    sr = np.asarray(T.sum_rows(jnp.asarray(x)))
    np.testing.assert_allclose(sr, x.sum(-1, keepdims=True), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(T.mean(jnp.asarray(x))),
                               x.mean(-1, keepdims=True), rtol=1e-6)


def test_win_part_roundtrip(rng):
    x = rng.standard_normal((2, 13, 17, 4)).astype(np.float32)
    w = 8
    parts = T.win_part(jnp.asarray(x), w)
    assert parts.shape == (2 * 2 * 3, w, w, 4)
    back = np.asarray(T.win_unpart(parts, 13, 17, w))
    np.testing.assert_array_equal(back, x)


def test_timestep_embedding():
    emb = np.asarray(T.timestep_embedding(jnp.asarray([0.0, 1.0, 10.0]), 8))
    assert emb.shape == (3, 8)
    np.testing.assert_allclose(emb[0, :4], 1.0)        # cos(0)
    np.testing.assert_allclose(emb[0, 4:], 0.0, atol=1e-7)


def test_cross_entropy_loss(rng):
    import torch
    logits = rng.standard_normal((5, 11)).astype(np.float32)
    labels = np.eye(11, dtype=np.float32)[rng.integers(0, 11, 5)]
    ref = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(labels)).item()
    got = float(np.asarray(T.cross_entropy_loss(jnp.asarray(logits),
                                                jnp.asarray(labels)))[0])
    assert abs(ref - got) < 1e-5


def naive_ssm_scan(state, x, dt, a, b, c):
    t, di = x.shape
    ds = a.shape[1]
    h = state.astype(np.float64).copy()
    y = np.zeros((t, di))
    for i2 in range(t):
        dtsp = np.where(dt[i2] <= 20.0, np.log1p(np.exp(dt[i2])), dt[i2])
        da = np.exp(dtsp[:, None] * a)
        h = h * da + b[i2][None, :] * (x[i2] * dtsp)[:, None]
        y[i2] = h @ c[i2]
    return y, h


def test_ssm_scan(rng):
    t, di, ds = 12, 6, 4
    state = rng.standard_normal((di, ds)).astype(np.float32) * 0.1
    x = rng.standard_normal((t, di)).astype(np.float32)
    dt = rng.standard_normal((t, di)).astype(np.float32)
    a = -np.abs(rng.standard_normal((di, ds))).astype(np.float32)
    b = rng.standard_normal((t, ds)).astype(np.float32)
    c = rng.standard_normal((t, ds)).astype(np.float32)
    ry, rh = naive_ssm_scan(state, x, dt, a, b, c)
    gy, gh = S.ssm_scan(*map(jnp.asarray, (state, x, dt, a, b, c)))
    np.testing.assert_allclose(ry, np.asarray(gy), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(rh, np.asarray(gh), rtol=1e-4, atol=1e-5)


def test_ssm_conv(rng):
    t, di, dc = 10, 5, 4
    state = rng.standard_normal((di, dc - 1)).astype(np.float32)
    x = rng.standard_normal((t, di)).astype(np.float32)
    c = rng.standard_normal((di, dc)).astype(np.float32)
    seq = np.concatenate([state.T, x], 0)
    ref = np.stack([(seq[i:i + dc].T * c).sum(-1) for i in range(t)])
    gy, gs = S.ssm_conv(jnp.asarray(state), jnp.asarray(x), jnp.asarray(c))
    np.testing.assert_allclose(ref, np.asarray(gy), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(gs), seq[t:].T)


def test_get_rel_pos_add_rel_pos(rng):
    # square case: rel coords are q - k + (kh-1)
    m = 7
    rel = rng.standard_normal((2 * m - 1, 3)).astype(np.float32)
    got = np.asarray(T.get_rel_pos(jnp.asarray(rel), m, m))
    for q in range(m):
        for k in range(m):
            np.testing.assert_array_equal(got[q, k], rel[q - k + m - 1])
    attn = rng.standard_normal((1, 4, 4)).astype(np.float32)
    rw = rng.standard_normal((1, 2, 2, 2)).astype(np.float32)
    rh = rng.standard_normal((1, 2, 2, 2)).astype(np.float32)
    out = np.asarray(T.add_rel_pos(jnp.asarray(attn), jnp.asarray(rw),
                                   jnp.asarray(rh)))
    a = attn.reshape(1, 2, 2, 2, 2) + rh[..., :, None] + rw[..., None, :]
    np.testing.assert_allclose(out, a.reshape(1, 4, 4), rtol=1e-6)
