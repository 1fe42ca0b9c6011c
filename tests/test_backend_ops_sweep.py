"""test-backend-ops analog: generated op x dtype x shape x broadcast sweep.

The reference validates every backend against the CPU reference through one
parametrized harness (/root/reference/tests/test-backend-ops.cpp: 91
emplacement sites sweeping types/shapes, NMSE tolerance per op :288, plus
whole-transformer-block graph cases test_llm/test_llama :1574/:1678). Here the
same roles are played by:

  numpy float64          = the reference "CPU backend"
  jitted XLA (f32/bf16)  = the production path under test
  Pallas interpret mode  = the device-kernel path under test
  torch (CPU)            = independent oracle for conv/pool families

Each case computes NMSE = mean((a-b)^2) / mean(b^2) against the reference and
asserts it under the per-op tolerance listed in TOL (the analog of
max_nmse_err, test-backend-ops.cpp:288-290).
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

from ggml_imax_tpu.ops import activations as act
from ggml_imax_tpu.ops import tensor_ops as top
from ggml_imax_tpu.ops.qmatmul import dequantize_xla, qmatmul
from ggml_imax_tpu.ops.softmax import alibi_slopes, soft_max_ext
from ggml_imax_tpu.quant.device import dequantize_qtensor, quantize_for_device
from ggml_imax_tpu.quant.formats import GGMLType

# ---- tolerances (NMSE), per op family — the max_nmse_err analog ----
TOL = {
    "unary_f32": 1e-10,
    "unary_bf16": 1e-4,     # bf16 has ~3 decimal digits
    "binary_f32": 1e-12,
    "softmax": 1e-10,
    "mulmat_f32": 5e-9,     # f32 matmul associativity reorder
    "mulmat_pallas": 5e-5,  # bf16 MXU operands, f32 accumulate
    "conv": 1e-9,
    "block_f32": 5e-7,      # whole transformer block, f32 XLA path
}


def nmse(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    denom = np.mean(b * b) + 1e-300
    return float(np.mean((a - b) ** 2) / denom)


# ---------------------------------------------------------------- unary ----
# numpy f64 mirrors (independent formulations, not jnp re-runs)
_SQRT_2_OVER_PI = np.sqrt(2.0 / np.pi)
UNARY_REF = {
    "gelu": lambda x: 0.5 * x * (1 + np.tanh(_SQRT_2_OVER_PI
                                             * (x + 0.044715 * x ** 3))),
    "gelu_quick": lambda x: x / (1 + np.exp(-1.702 * x)),
    "silu": lambda x: x / (1 + np.exp(-x)),
    "relu": lambda x: np.maximum(x, 0),
    "sigmoid": lambda x: 1 / (1 + np.exp(-x)),
    "tanh": np.tanh,
    "elu": lambda x: np.where(x > 0, x, np.expm1(x)),
    "hardswish": lambda x: x * np.clip(x + 3, 0, 6) / 6,
    "hardsigmoid": lambda x: np.clip(x + 3, 0, 6) / 6,
    "abs_": np.abs,
    "sgn": np.sign,
    "neg": lambda x: -x,
    "step": lambda x: (x > 0).astype(np.float64),
    "relu_squared": lambda x: np.maximum(x, 0) ** 2,
    "leaky_relu": lambda x: np.where(x > 0, x, 0.1 * x),
}
UNARY_SHAPES = [(7,), (63, 129), (2, 3, 5, 7), (128, 256)]


@pytest.mark.parametrize("name", sorted(UNARY_REF))
@pytest.mark.parametrize("dt", ["f32", "bf16"])
def test_unary_sweep(rng, name, dt):
    fn = getattr(act, name)
    jdt = jnp.float32 if dt == "f32" else jnp.bfloat16
    for shape in UNARY_SHAPES:
        x = rng.standard_normal(shape).astype(np.float32) * 2.0
        got = np.asarray(jax.jit(fn)(jnp.asarray(x, jdt)), np.float64)
        ref = UNARY_REF[name](
            np.asarray(jnp.asarray(x, jdt), np.float64))
        assert nmse(got, ref) < TOL[f"unary_{dt}"], (name, dt, shape)


# --------------------------------------------------------------- binary ----
# ggml bin_bcast shape grid (test-backend-ops.cpp:802): src1 broadcast into
# src0 along any subset of dims
BCAST_SHAPES = [
    ((16, 10, 1, 1), (16, 10, 1, 1)),
    ((16, 10, 2, 5), (16, 10, 2, 5)),
    ((16, 10, 2, 5), (1, 1, 1, 1)),
    ((16, 10, 2, 5), (16, 1, 1, 1)),
    ((16, 10, 2, 5), (1, 10, 2, 5)),
    ((16, 10, 2, 5), (16, 10, 1, 1)),
    ((64, 262, 1, 1), (64, 1, 1, 1)),
]
BINOPS = {"add": np.add, "sub": np.subtract, "mul": np.multiply,
          "div": np.divide}


@pytest.mark.parametrize("op", sorted(BINOPS))
def test_binary_broadcast_sweep(rng, op):
    jop = {"add": jnp.add, "sub": jnp.subtract, "mul": jnp.multiply,
           "div": jnp.divide}[op]
    for sa, sb in BCAST_SHAPES:
        a = rng.standard_normal(sa).astype(np.float32)
        b = rng.standard_normal(sb).astype(np.float32) + 2.0  # div-safe
        got = np.asarray(jax.jit(jop)(jnp.asarray(a), jnp.asarray(b)))
        ref = BINOPS[op](a.astype(np.float64), b.astype(np.float64))
        assert nmse(got, ref) < TOL["binary_f32"], (op, sa, sb)


# -------------------------------------------------------------- softmax ----
@pytest.mark.parametrize("scale", [1.0, 0.125])
@pytest.mark.parametrize("max_bias", [0.0, 8.0])
def test_softmax_sweep(rng, scale, max_bias):
    for B, H, Tq, Tk in [(1, 1, 5, 7), (2, 4, 16, 33), (1, 8, 1, 257)]:
        x = rng.standard_normal((B, H, Tq, Tk)).astype(np.float32)
        mask = np.where(rng.random((B, 1, Tq, Tk)) < 0.2, -np.inf,
                        0.0).astype(np.float32)
        # keep at least one visible position per row
        mask[..., 0] = 0.0
        got = np.asarray(soft_max_ext(jnp.asarray(x), jnp.asarray(mask),
                                      scale=scale, max_bias=max_bias))
        s = x.astype(np.float64) * scale
        mb = mask.astype(np.float64)
        if max_bias > 0:
            slopes = np.asarray(alibi_slopes(H, max_bias),
                                np.float64).reshape(1, H, 1, 1)
            s = s + slopes * mb
        else:
            s = s + mb
        s = s - s.max(-1, keepdims=True)
        e = np.exp(s)
        e[np.isneginf(s)] = 0.0
        ref = e / e.sum(-1, keepdims=True)
        assert nmse(got, ref) < TOL["softmax"], (B, H, Tq, Tk)


# -------------------------------------------------------------- mul_mat ----
# the workhorse (test-backend-ops.cpp:908): every quant type x m/n/k x batch
MULMAT_TYPES = ["F16", "Q4_0", "Q4_1", "Q5_0", "Q5_1", "Q8_0",
                "Q2_K", "Q3_K", "Q4_K", "Q5_K", "Q6_K", "IQ4_NL", "IQ4_XS"]
MULMAT_MNK = [(1, 256, 32), (5, 256, 48), (17, 512, 64), (33, 256, 128)]


@pytest.mark.parametrize("tname", MULMAT_TYPES)
def test_mulmat_type_sweep(rng, tname):
    t = getattr(GGMLType, tname)
    for m, k, n in MULMAT_MNK:
        w = (rng.standard_normal((k, n)) * 0.1).astype(np.float32)
        qt = quantize_for_device(w, t)
        x = rng.standard_normal((m, k)).astype(np.float32)
        got = np.asarray(qmatmul(jnp.asarray(x), qt,
                                 compute_dtype=jnp.float32,
                                 precision="highest",
                                 out_dtype=jnp.float32))
        wd = dequantize_qtensor(qt).astype(np.float64)
        ref = x.astype(np.float64) @ wd
        assert nmse(got, ref) < TOL["mulmat_f32"], (tname, m, k, n)


def test_mulmat_batched_broadcast(rng):
    """leading batch dims on the activation side (ggml mul_mat broadcast)."""
    qt = quantize_for_device(
        (rng.standard_normal((256, 64)) * 0.1).astype(np.float32),
        GGMLType.Q4_0)
    wd = dequantize_qtensor(qt).astype(np.float64)
    for lead in [(2,), (2, 3), (4, 1, 2)]:
        x = rng.standard_normal((*lead, 7, 256)).astype(np.float32)
        got = np.asarray(qmatmul(jnp.asarray(x), qt,
                                 compute_dtype=jnp.float32,
                                 precision="highest",
                                 out_dtype=jnp.float32))
        ref = x.astype(np.float64) @ wd
        assert nmse(got, ref) < TOL["mulmat_f32"], lead


PALLAS_TYPES = ["Q4_0", "Q4_1", "Q2_K", "Q4_K", "Q8_0", "Q6_K", "IQ4_NL"]


@pytest.mark.parametrize("tname", PALLAS_TYPES)
def test_mulmat_pallas_sweep(rng, tname):
    """Pallas fused kernel (all three layouts) vs the XLA dequant path over
    an m-grid that crosses the 512-row m-tile boundary."""
    from ggml_imax_tpu.ops.pallas_qmm import (DEFAULT_BM, params_repack_device,
                                              qmatmul_pallas)
    t = getattr(GGMLType, tname)
    k, n = 512, 128
    w = (rng.standard_normal((k, n)) * 0.1).astype(np.float32)
    qt = quantize_for_device(w, t)
    qtr = params_repack_device({"w": qt})["w"]
    assert qtr.interleaved_bk > 0
    wd = dequantize_qtensor(qt).astype(np.float64)
    for m in [1, 8, 33, DEFAULT_BM + 1]:
        x = (rng.standard_normal((m, k)) * 0.5).astype(np.float32)
        got = np.asarray(qmatmul_pallas(jnp.asarray(x), qtr, interpret=True))
        ref = x.astype(np.float64) @ wd
        assert nmse(got, ref) < TOL["mulmat_pallas"], (tname, m)


# ----------------------------------------------------------- conv/pool -----
def test_conv2d_vs_torch(rng):
    import torch

    from ggml_imax_tpu.ops.conv import conv_2d
    for (ic, oc, kh, kw, h, w, s, p, d) in [
            (3, 8, 3, 3, 16, 16, 1, 1, 1),
            (4, 4, 5, 3, 20, 17, 2, 2, 1),
            (1, 2, 3, 3, 9, 9, 1, 0, 2)]:
        x = rng.standard_normal((1, ic, h, w)).astype(np.float32)
        kern = rng.standard_normal((oc, ic, kh, kw)).astype(np.float32)
        got = np.asarray(conv_2d(jnp.asarray(x), jnp.asarray(kern),
                                 s0=s, s1=s, p0=p, p1=p, d0=d, d1=d))
        ref = torch.nn.functional.conv2d(
            torch.from_numpy(x), torch.from_numpy(kern),
            stride=s, padding=p, dilation=d).numpy()
        assert nmse(got, ref) < TOL["conv"], (ic, oc, kh, kw)


def test_pool2d_vs_torch(rng):
    import torch

    from ggml_imax_tpu.ops.conv import pool_2d
    for op in ("max", "avg"):
        for (c, h, w, k, s, p) in [(3, 16, 16, 2, 2, 0), (2, 15, 17, 3, 2, 1)]:
            x = rng.standard_normal((1, c, h, w)).astype(np.float32)
            got = np.asarray(pool_2d(jnp.asarray(x), op, k, k, s, s, p, p))
            tf = (torch.nn.functional.max_pool2d if op == "max"
                  else torch.nn.functional.avg_pool2d)
            kwargs = {} if op == "max" else {"count_include_pad": True}
            ref = tf(torch.from_numpy(x), k, stride=s, padding=p,
                     **kwargs).numpy()
            assert nmse(got, ref) < TOL["conv"], (op, c, h, w, k, s, p)


# ------------------------------------------------- whole-block graph case ----
def test_transformer_block_differential(rng):
    """test_llm/test_llama analog (test-backend-ops.cpp:1574,1678): a full
    pre-norm transformer block — RMSNorm -> quantized QKV -> RoPE -> causal
    attention -> output proj -> RMSNorm -> SwiGLU MLP — run through the
    framework ops with Q4_0 weights, compared against an independent numpy
    f64 graph over the dequantized weights."""
    from ggml_imax_tpu.ops.attention import attention_xla, causal_mask
    from ggml_imax_tpu.ops.norms import rms_norm
    from ggml_imax_tpu.ops.rope import ROPE_MODE_NEOX, rope

    B, T, H, D = 1, 12, 4, 32
    E = H * D
    F = 2 * E

    def qw(k_, n_):
        return quantize_for_device(
            (rng.standard_normal((k_, n_)) * 0.08).astype(np.float32),
            GGMLType.Q4_0)

    p = {"wq": qw(E, E), "wk": qw(E, E), "wv": qw(E, E), "wo": qw(E, E),
         "w1": qw(E, F), "w3": qw(E, F), "w2": qw(F, E)}
    x = rng.standard_normal((B, T, E)).astype(np.float32)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))

    # framework path (f32 compute for the tolerance budget of this test)
    def fw(x):
        h = rms_norm(x)
        kw = dict(compute_dtype=jnp.float32, precision="highest",
                  out_dtype=jnp.float32)
        q = qmatmul(h, p["wq"], **kw).reshape(B, T, H, D)
        k_ = qmatmul(h, p["wk"], **kw).reshape(B, T, H, D)
        v = qmatmul(h, p["wv"], **kw).reshape(B, T, H, D)
        q = rope(q, pos, mode=ROPE_MODE_NEOX)
        k_ = rope(k_, pos, mode=ROPE_MODE_NEOX)
        mask = causal_mask(T, T, 0)[None, None]
        a = attention_xla(q, k_, v, mask, precision="highest",
                          out_dtype=jnp.float32).reshape(B, T, E)
        x1 = x + qmatmul(a, p["wo"], **kw)
        h2 = rms_norm(x1)
        g = qmatmul(h2, p["w1"], **kw)
        u = qmatmul(h2, p["w3"], **kw)
        mlp = qmatmul(g / (1 + jnp.exp(-g)) * u, p["w2"], **kw)
        return x1 + mlp

    got = np.asarray(jax.jit(fw)(jnp.asarray(x)))

    # independent numpy f64 graph
    W = {k_: dequantize_qtensor(v).astype(np.float64)
         for k_, v in p.items()}
    xf = x.astype(np.float64)

    def np_rms(v):
        return v / np.sqrt(np.mean(v * v, -1, keepdims=True) + 1e-6)

    def np_rope_neox(v):
        # NeoX rope: rotate pairs (i, i+D/2) with theta = pos*base^(-2i/D)
        out = v.copy()
        half = D // 2
        for t_ in range(T):
            inv = 10000.0 ** (-np.arange(half, dtype=np.float64) * 2 / D)
            ang = t_ * inv
            c, s = np.cos(ang), np.sin(ang)
            a = v[:, t_, :, :half]
            b_ = v[:, t_, :, half:]
            out[:, t_, :, :half] = a * c - b_ * s
            out[:, t_, :, half:] = a * s + b_ * c
        return out

    h = np_rms(xf)
    q = (h @ W["wq"]).reshape(B, T, H, D)
    k_ = (h @ W["wk"]).reshape(B, T, H, D)
    v = (h @ W["wv"]).reshape(B, T, H, D)
    q, k_ = np_rope_neox(q), np_rope_neox(k_)
    s = np.einsum("bqhd,bkhd->bhqk", q, k_) / np.sqrt(D)
    causal = np.tril(np.ones((T, T)))
    s = np.where(causal[None, None] > 0, s, -np.inf)
    e = np.exp(s - s.max(-1, keepdims=True))
    pmat = e / e.sum(-1, keepdims=True)
    a = np.einsum("bhqk,bkhd->bqhd", pmat, v).reshape(B, T, E)
    x1 = xf + a @ W["wo"]
    h2 = np_rms(x1)
    g = h2 @ W["w1"]
    u = h2 @ W["w3"]
    ref = x1 + (g / (1 + np.exp(-g)) * u) @ W["w2"]

    assert nmse(got, ref) < TOL["block_f32"]
