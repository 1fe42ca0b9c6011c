"""Gradients through the fused Pallas kernels.

The reference differentiates its fused attention via an explicit backward op
(GGML_OP_FLASH_ATTN_BACK, /root/reference/include/ggml/ggml.h:424-512) and
validates autodiff with central-difference checks (tests/test-grad0.cpp:211-285).
Here: jax.grad through ops.flash_attention runs the Pallas backward kernels
(ops/flash_backward.py) — these tests compare those grads against (a) the
differentiable XLA reference path and (b) numeric central differences, and run
a full training step through a flash-attention model.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture()
def rng():
    # module-local stream: keeps the session rng fixture's draw order
    # stable for seed-sensitive tests elsewhere in the suite
    return np.random.default_rng(20240816)

from ggml_imax_tpu.ops.attention import attention_xla
from ggml_imax_tpu.ops.flash_attention import flash_attention


def _causal(B, Tq, Tk):
    qp = np.arange(Tq)[:, None] + (Tk - Tq)
    kp = np.arange(Tk)[None, :]
    m = np.where(kp <= qp, 0.0, -1e9).astype(np.float32)
    return jnp.broadcast_to(jnp.asarray(m)[None, None], (B, 1, Tq, Tk))


CASES = [
    # B, Tq, Tk, Hq, Hkv, D, causal, softcap, max_bias
    (2, 16, 16, 4, 4, 32, False, 0.0, 0.0),
    (1, 24, 40, 4, 2, 64, True, 0.0, 0.0),    # GQA + rectangular + causal
    (1, 16, 16, 4, 4, 32, True, 5.0, 0.0),    # logit softcap
    (1, 16, 16, 8, 8, 32, True, 0.0, 8.0),    # ALiBi
    (2, 8, 128, 4, 1, 16, False, 0.0, 0.0),   # MQA, long KV
]


@pytest.mark.parametrize("case", CASES, ids=[str(i) for i in range(len(CASES))])
def test_flash_grads_match_xla(rng, case):
    B, Tq, Tk, Hq, Hkv, D, causal, softcap, max_bias = case
    q = jnp.asarray(rng.standard_normal((B, Tq, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Tk, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Tk, Hkv, D)), jnp.float32)
    mask = _causal(B, Tq, Tk) if causal else None

    def loss(f):
        def g(q, k, v):
            o = f(q, k, v, mask, scale=0.25, logit_softcap=softcap,
                  max_bias=max_bias, out_dtype=jnp.float32)
            return jnp.sum(jnp.sin(o))
        return g

    gf = jax.grad(loss(flash_attention), argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss(attention_xla), argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gf, gx):
        err = float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))
        assert err < 3e-2, f"d{name} rel err {err}"


def test_flash_grad_central_difference(rng):
    """test-grad0 analog (tests/test-grad0.cpp:211-285) on the flash kernel
    itself (not the XLA fallback): directional central differences.

    The kernel rounds operands to bf16 internally, so pointwise finite
    differences are dominated by rounding noise; a directional derivative
    along a random unit direction averages that noise over the whole tensor
    (the same reason ggml uses per-op tolerances, not exactness)."""
    B, T, H, D = 1, 16, 2, 32
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    mask = _causal(B, T, T)

    def loss(q, k, v):
        o = flash_attention(q, k, v, mask, out_dtype=jnp.float32)
        return jnp.sum(o * o)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    eps = 0.125
    for argi, (arr, garr) in enumerate(zip((q, k, v), g)):
        # probe along the gradient direction: a random direction's projection
        # is O(|g|/sqrt(N)) and drowns in the kernel's bf16 forward noise
        u = garr / jnp.linalg.norm(garr)
        args_p = [a + (eps * u if i == argi else 0)
                  for i, a in enumerate((q, k, v))]
        args_m = [a - (eps * u if i == argi else 0)
                  for i, a in enumerate((q, k, v))]
        num = (loss(*args_p) - loss(*args_m)) / (2 * eps)
        got = jnp.vdot(garr, u)
        rel = abs(float(num) - float(got)) / max(1.0, abs(float(num)))
        assert rel < 5e-2, (argi, float(num), float(got), rel)


def test_qmatmul_fused_vjp(rng):
    """dequant-weight VJP for the fused quantized matmul: grads flow to the
    activations; the quantized weight pytree gets zero/float0 cotangents."""
    from ggml_imax_tpu.ops.pallas_qmm import repack_rowpair_device
    from ggml_imax_tpu.ops.qmatmul import _qmm_fused, dequantize_xla
    from ggml_imax_tpu.quant.device import quantize_for_device
    from ggml_imax_tpu.quant.formats import GGMLType

    w = (rng.standard_normal((512, 512)) * 0.05).astype(np.float32)
    qt = repack_rowpair_device(quantize_for_device(w, GGMLType.Q4_0))
    x = jnp.asarray(rng.standard_normal((4, 512)), jnp.float32)

    def l(x):
        return jnp.sum(jnp.sin(_qmm_fused(x, qt)))

    dx = jax.grad(l)(x)
    wd = dequantize_xla(qt, dtype=jnp.float32)

    def l_ref(x):
        return jnp.sum(jnp.sin(jnp.matmul(x, wd,
                                          preferred_element_type=jnp.float32)))

    dx_ref = jax.grad(l_ref)(x)
    err = float(jnp.abs(dx - dx_ref).max() / (jnp.abs(dx_ref).max() + 1e-9))
    assert err < 3e-2, err


def test_training_step_through_flash(rng):
    """One AdamW step on a toy transformer block whose attention is the
    Pallas flash kernel (interpret mode on CPU) — the 'training step through
    a flash-attention model runs' gate."""
    import optax

    B, T, H, D = 2, 16, 2, 16
    E = H * D
    p = {
        "wqkv": jnp.asarray(rng.standard_normal((E, 3 * E)) * 0.05,
                            jnp.float32),
        "wo": jnp.asarray(rng.standard_normal((E, E)) * 0.05, jnp.float32),
    }
    x = jnp.asarray(rng.standard_normal((B, T, E)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((B, T, E)), jnp.float32)
    mask = _causal(B, T, T)

    def f(p, x):
        qkv = x @ p["wqkv"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, H, D)
        k = k.reshape(B, T, H, D)
        v = v.reshape(B, T, H, D)
        o = flash_attention(q, k, v, mask, out_dtype=jnp.float32)
        return o.reshape(B, T, E) @ p["wo"]

    def loss(p):
        return jnp.mean((f(p, x) - y) ** 2)

    opt = optax.adamw(1e-2)
    state = opt.init(p)
    l0 = float(loss(p))
    for _ in range(5):
        g = jax.grad(loss)(p)
        upd, state = opt.update(g, state, p)
        p = optax.apply_updates(p, upd)
    l1 = float(loss(p))
    assert l1 < l0, (l0, l1)
