#!/usr/bin/env python
"""Diagnose the decode-step regression: time the same GEMV through each
dispatch level, then a single GPT-J layer, then a 2-layer model step."""
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

from ggml_imax_tpu.ops.pallas_qmm import (qmatmul_pallas,
                                          repack_natpair_device)
from ggml_imax_tpu.ops.qmatmul import qmatmul
from ggml_imax_tpu.quant.device import quantize_for_device
from ggml_imax_tpu.quant.formats import GGMLType

K, N = 4096, 16384
rng = np.random.default_rng(0)


def timeit(fn, reps=32):
    def chain(r):
        @jax.jit
        def f(seed):
            s = seed
            for _ in range(r):
                out = fn(s)
                s = out.reshape(-1)[0] * jnp.float32(1e-30)
            return s
        return f
    f1, f4 = chain(reps), chain(4 * reps)
    s0 = jnp.float32(0.0)
    _ = float(f1(s0)); _ = float(f4(s0))

    def run(f):
        t0 = time.perf_counter()
        _ = float(f(s0))
        return time.perf_counter() - t0
    t1 = min(run(f1) for _ in range(3))
    t4 = min(run(f4) for _ in range(3))
    return max(1e-9, (t4 - t1) / (3 * reps))


w = (rng.standard_normal((K, N)) * 0.02).astype(np.float32)
qt = repack_natpair_device(quantize_for_device(w, GGMLType.Q4_0))
jax.block_until_ready(qt.q)
x = jnp.asarray((rng.standard_normal((1, K)) * 0.5).astype(np.float32))

dt = timeit(lambda s: qmatmul_pallas(x + s, qt))
print(f"qmatmul_pallas direct      {dt*1e6:9.1f} us", flush=True)

dt = timeit(lambda s: qmatmul(x + s, qt, out_dtype=jnp.float32))
print(f"qmatmul public (custom_vjp){dt*1e6:9.1f} us", flush=True)

# batched-leading-dims shape as the model calls it: (B, T, K) = (1, 1, K)
x3 = x[None]
dt = timeit(lambda s: qmatmul(x3 + s, qt, out_dtype=jnp.float32))
print(f"qmatmul (1,1,K) shape      {dt*1e6:9.1f} us", flush=True)

# one full GPT-J layer at 6B geometry, decode shape
from ggml_imax_tpu.models import gptj
cfg = gptj.GPTJConfig(n_vocab=1024, n_ctx=512, n_embd=4096, n_head=16,
                      n_layer=2, n_rot=64)
params = gptj.synthetic_params_device(cfg, GGMLType.Q4_0, seed=0)
params = gptj.fuse_qkv(params)
from ggml_imax_tpu.ops.pallas_qmm import params_repack_device
params = params_repack_device(params)
jax.block_until_ready(jax.tree.leaves(params))
cache = gptj.init_cache(cfg, batch=1, n_ctx=512, dtype=jnp.bfloat16)

tok = jnp.ones((1, 1), jnp.int32)


def step(s, cache):
    pos = jnp.full((1, 1), 5, jnp.int32)
    logits, cache2 = gptj.forward(cfg, params, tok, pos, cache, 5)
    return logits + s, cache2


@jax.jit
def chain_steps(seed, cache, r):
    s = seed
    for _ in range(r):
        out, cache = step(s, cache)
        s = out.reshape(-1)[0] * jnp.float32(1e-30)
    return s, cache


import functools
cj = jax.jit(functools.partial(chain_steps.__wrapped__, r=8))
cj4 = jax.jit(functools.partial(chain_steps.__wrapped__, r=32))
s0 = jnp.float32(0.0)
s, cache = cj(s0, cache); _ = float(s)
s, cache = cj4(s0, cache); _ = float(s)
t0 = time.perf_counter(); s, cache = cj(s0, cache); _ = float(s)
t1 = time.perf_counter() - t0
t0 = time.perf_counter(); s, cache = cj4(s0, cache); _ = float(s)
t4 = time.perf_counter() - t0
dt = (t4 - t1) / 24
print(f"2-layer 6B-geom decode step{dt*1e6:9.1f} us  "
      f"(~{dt/2*1e6:.0f} us/layer)", flush=True)
