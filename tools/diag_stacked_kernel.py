#!/usr/bin/env python
"""Microbench: stacked (scalar-prefetch layer index) vs per-layer W4A8 GEMV
kernels on the real chip. Cycles through 8 layers/buffers so the weight
stream is honest HBM traffic (memory: VMEM pinning flatters single-buffer
loops)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ggml_imax_tpu.quant.codecs import quantize
from ggml_imax_tpu.quant.formats import GGMLType
from ggml_imax_tpu.quant.device import to_device_format, stack_layers
from ggml_imax_tpu.ops.pallas_qmm import params_repack_device
from ggml_imax_tpu.ops.qmatmul import qmatmul, qmatmul_stacked

L = 8
K, N = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (20480, 4096)
rng = np.random.default_rng(0)

w = rng.standard_normal((N, K), dtype=np.float32) * 0.02
raw = quantize(w, GGMLType.Q4_0)
qts = [to_device_format(raw, GGMLType.Q4_0, (K, N)) for _ in range(L)]

# repack each (interleaved natpair) then stack
packed = params_repack_device({"layers": [{"w": t} for t in qts]})
per_layer = [lp["w"] for lp in packed["layers"]]
qts2 = [to_device_format(raw, GGMLType.Q4_0, (K, N)) for _ in range(L)]
packed2 = params_repack_device({"layers": [{"w": t} for t in qts2]})
stacked = stack_layers(packed2["layers"])["w"]
jax.block_until_ready([t.q for t in per_layer] + [stacked.q])
print(f"K={K} N={N} L={L} layout={per_layer[0].q4_layout} "
      f"ibk={per_layer[0].interleaved_bk}")

x = jnp.asarray(rng.standard_normal((1, K)), jnp.bfloat16)

# --- per-layer kernels (the r02 fast path) ---
f_per = jax.jit(lambda x, qt: qmatmul(x, qt, out_dtype=jnp.float32))
for t in per_layer:
    f_per(x, t).block_until_ready()
acc_add = jax.jit(lambda a, o: a + o[0, 0])
for rep in range(3):
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for it in range(64):
        acc = acc_add(acc, f_per(x, per_layer[it % L]))
    _ = float(acc)
    dt = (time.perf_counter() - t0) / 64
    gbs = (K * N // 2 + K // 32 * N * 4) / dt / 1e9
    print(f"per-layer rep{rep}: {dt*1e3:.3f} ms/call  {gbs:.0f} GB/s")

# --- stacked kernel, python-loop over li ---
f_stk = jax.jit(lambda x, qt, li: qmatmul_stacked(x, qt, li))
for li in range(L):
    f_stk(x, stacked, jnp.int32(li)).block_until_ready()
for rep in range(3):
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for it in range(64):
        acc = acc_add(acc, f_stk(x, stacked, jnp.int32(it % L)))
    _ = float(acc)
    dt = (time.perf_counter() - t0) / 64
    gbs = (K * N // 2 + K // 32 * N * 4) / dt / 1e9
    print(f"stacked   rep{rep}: {dt*1e3:.3f} ms/call  {gbs:.0f} GB/s")

# --- stacked kernel inside lax.scan (the real decode usage) ---
def scan_fn(x, qt):
    def body(carry, li):
        y = qmatmul_stacked(x, qt, li)
        return carry + jnp.sum(y), None
    s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(L, dtype=jnp.int32))
    return s

f_scan = jax.jit(scan_fn)
f_scan(x, stacked).block_until_ready()
for rep in range(3):
    t0 = time.perf_counter()
    for it in range(8):
        _ = float(f_scan(x, stacked))
    dt = (time.perf_counter() - t0) / (8 * L)
    gbs = (K * N // 2 + K // 32 * N * 4) / dt / 1e9
    print(f"scan-stk  rep{rep}: {dt*1e3:.3f} ms/call  {gbs:.0f} GB/s")

# --- variant C: stack flattened into K (2D blocks, scalar-prefetch offset) ---
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from ggml_imax_tpu.ops.pallas_qmm import (_kernel_natpair_w4a8,
                                          _quantize_activations_q8,
                                          _W4A8_BKK, _W4A8_BN)


def w4a8_flat(x, q2, sc2, li, k, n, L):
    bkk = _W4A8_BKK
    nbk = bkk // 32
    bn = min(_W4A8_BN, n)
    m = x.shape[0]
    x8t, dx = _quantize_activations_q8(x, k)
    nk = k // bkk

    def kern(s_ref, x8_ref, qs_ref, scr_ref, dx_ref, o_ref, acc_ref):
        _kernel_natpair_w4a8(False, nbk, False,
                             x8_ref, qs_ref, scr_ref, dx_ref, o_ref, acc_ref)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // bn, nk),
        in_specs=[
            pl.BlockSpec((nbk, m, 32), lambda nn, kk, s: (kk, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bkk // 2, bn), lambda nn, kk, s: (s[0] * nk + kk, nn),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbk, bn), lambda nn, kk, s: (s[0] * nk + kk, nn),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbk, m), lambda nn, kk, s: (kk, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda nn, kk, s: (0, nn),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
    )
    return pl.pallas_call(
        kern, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=k * n // 2 + k // 32 * n * 4 + m * k + m * n * 4,
            transcendentals=0),
    )(jnp.asarray(li, jnp.int32).reshape(1), x8t, q2, sc2, dx)


q2 = stacked.q.reshape(L * K // 2, N)
sc2 = stacked.scale.reshape(L * K // 32, N)
jax.block_until_ready([q2, sc2])
f_flat = jax.jit(partial(w4a8_flat, k=K, n=N, L=L))
for li in range(L):
    f_flat(x, q2, sc2, jnp.int32(li)).block_until_ready()
for rep in range(3):
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for it in range(64):
        acc = acc_add(acc, f_flat(x, q2, sc2, jnp.int32(it % L)))
    _ = float(acc)
    dt = (time.perf_counter() - t0) / 64
    gbs = (K * N // 2 + K // 32 * N * 4) / dt / 1e9
    print(f"flat-2d   rep{rep}: {dt*1e3:.3f} ms/call  {gbs:.0f} GB/s")
