"""Training-stack tests: the reference's test-opt.cpp (optimizer convergence
on a least-squares problem) and test-grad0.cpp (central-difference numeric
gradients vs the autodiff backward graph) analogs.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ggml_imax_tpu.optimize import (AdamParams, OptParams, OptResult,
                                    default_params, opt, opt_resume, opt_init)


def lstsq_problem(rng, m=32, n=8):
    a = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((m,)).astype(np.float32))

    def loss(x):
        r = a @ x - b
        return jnp.mean(r * r)

    x0 = jnp.asarray(rng.standard_normal((n,)).astype(np.float32))
    x_star = np.linalg.lstsq(np.asarray(a), np.asarray(b), rcond=None)[0]
    return loss, x0, x_star


def test_opt_adam_converges(rng):
    loss, x0, x_star = lstsq_problem(rng)
    p = default_params("adam")
    p.adam = AdamParams(n_iter=2000, alpha=5e-2, eps_f=1e-9, eps_g=1e-6)
    res, x, ctx = opt(loss, x0, p)
    assert res in (OptResult.OK, OptResult.DID_NOT_CONVERGE)
    np.testing.assert_allclose(np.asarray(x), x_star, atol=1e-2)
    assert ctx.loss_after < ctx.loss_before


def test_opt_lbfgs_converges(rng):
    loss, x0, x_star = lstsq_problem(rng)
    p = default_params("lbfgs")
    p.lbfgs.n_iter = 100
    res, x, _ = opt(loss, x0, p)
    np.testing.assert_allclose(np.asarray(x), x_star, atol=1e-3)


def test_opt_resume_continues(rng):
    """ggml_opt_resume semantics: moments survive across calls."""
    loss, x0, _ = lstsq_problem(rng)
    p = default_params("adam")
    p.adam = AdamParams(n_iter=50, alpha=1e-2, eps_f=0.0, eps_g=0.0)
    p.max_no_improvement = 0
    ctx = opt_init(p, x0)
    _, x1 = opt_resume(ctx, loss, x0)
    l1 = float(loss(x1))
    _, x2 = opt_resume(ctx, loss, x1)
    assert float(loss(x2)) < l1
    assert ctx.iter == 100


def test_opt_callback_cancel(rng):
    loss, x0, _ = lstsq_problem(rng)
    p = default_params("adam")
    p.adam = AdamParams(n_iter=1000, alpha=1e-3, eps_f=0.0, eps_g=0.0)
    res, _, ctx = opt(loss, x0, p, callback=lambda it, f: it >= 5)
    assert res is OptResult.CANCEL and ctx.iter == 5


# ---- test-grad0 analog: numeric vs autodiff gradients ----

def numeric_grad(f, x, eps=1e-3):
    x = np.asarray(x, np.float64)
    g = np.zeros_like(x)
    it = np.nditer(x, flags=["multi_index"])
    while not it.finished:
        i = it.multi_index
        xp, xm = x.copy(), x.copy()
        xp[i] += eps
        xm[i] -= eps
        g[i] = (float(f(jnp.asarray(xp, jnp.float32)))
                - float(f(jnp.asarray(xm, jnp.float32)))) / (2 * eps)
        it.iternext()
    return g


def check_gradient(f, x, rtol=5e-2, atol=1e-3):
    """test-grad0.cpp:211-285 style: central difference vs backward pass."""
    auto = np.asarray(jax.grad(lambda v: f(v).sum()
                               if np.ndim(f(v)) else f(v))(jnp.asarray(x)))
    num = numeric_grad(lambda v: jnp.sum(f(v)), x)
    np.testing.assert_allclose(auto, num, rtol=rtol, atol=atol)


def test_grad_matmul(rng):
    a = rng.standard_normal((4, 6)).astype(np.float32)
    b = jnp.asarray(rng.standard_normal((6, 3)).astype(np.float32))
    check_gradient(lambda x: x @ b, a)


def test_grad_softmax(rng):
    from ggml_imax_tpu.ops.softmax import soft_max_ext
    x = rng.standard_normal((2, 2, 3, 5)).astype(np.float32)
    check_gradient(lambda v: soft_max_ext(v, scale=0.5) ** 2, x)


def test_grad_norms(rng):
    # the ops compute in f32 internally, so the central difference carries
    # ~1e-5/(2*eps) roundoff — probe wider and bound abs error accordingly
    from ggml_imax_tpu.ops.norms import layer_norm, rms_norm
    x = rng.standard_normal((3, 8)).astype(np.float32)
    for f in (lambda v: layer_norm(v) ** 2, lambda v: rms_norm(v) ** 2):
        auto = np.asarray(jax.grad(lambda v: jnp.sum(f(v)))(jnp.asarray(x)))
        num = numeric_grad(lambda v: jnp.sum(f(v)), x, eps=1e-2)
        np.testing.assert_allclose(auto, num, rtol=5e-2, atol=5e-3)


def test_grad_unary(rng):
    from ggml_imax_tpu.ops.activations import gelu, silu
    x = rng.standard_normal((4, 4)).astype(np.float32)
    check_gradient(gelu, x)
    check_gradient(silu, x)


def test_grad_rope(rng):
    from ggml_imax_tpu.ops.rope import rope
    x = rng.standard_normal((1, 3, 2, 8)).astype(np.float32)
    pos = jnp.arange(3, dtype=jnp.int32)[None]
    check_gradient(lambda v: rope(v, pos, n_dims=8, mode=0) ** 2, x)


def test_grad_cross_entropy(rng):
    from ggml_imax_tpu.ops.tensor_ops import cross_entropy_loss
    x = rng.standard_normal((4, 7)).astype(np.float32)
    labels = jnp.asarray(np.eye(7, dtype=np.float32)[rng.integers(0, 7, 4)])
    check_gradient(lambda v: cross_entropy_loss(v, labels), x)


def test_grad_flash_attention_vs_xla(rng):
    """Flash kernel differentiates via its composing jnp ops in interpret
    mode; grads must match the XLA reference path."""
    from ggml_imax_tpu.ops.attention import attention_xla
    q = rng.standard_normal((1, 4, 2, 64)).astype(np.float32)
    k = jnp.asarray(rng.standard_normal((1, 4, 2, 64)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 4, 2, 64)).astype(np.float32))
    g = np.asarray(jax.grad(
        lambda x: jnp.sum(attention_xla(x, k, v) ** 2))(jnp.asarray(q)))
    num = numeric_grad(
        lambda x: jnp.sum(attention_xla(x, k, v) ** 2), q, eps=1e-2)
    np.testing.assert_allclose(g, num, rtol=5e-2, atol=5e-3)
