#!/usr/bin/env python
"""Isolate stacked-scan vs unstacked-loop GEMV bandwidth end-to-end.

28 layers of a (20480 -> 4096) Q4_0 natpair GEMV, chained through the
activation (y tiled back up to K), ONE executable per variant, one scalar
fetch at the end — the only timing methodology the axon tunnel respects."""
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

L, K, N = 8, 20480, 4096
REPS = 8           # GEMV sweeps per executable call
rng = np.random.default_rng(0)
w = rng.standard_normal((N, K), dtype=np.float32) * 0.02
raw = quantize(w, GGMLType.Q4_0)

t0 = time.time()
base = to_device_format(raw, GGMLType.Q4_0, (K, N))   # decode raw ONCE
from dataclasses import replace as _rp
mk = lambda: _rp(base, q=base.q.copy(), scale=base.scale.copy())
packed = params_repack_device({"layers": [{"w": mk()} for _ in range(L)]})
per_layer = [lp["w"] for lp in packed["layers"]]
packed2 = params_repack_device({"layers": [{"w": mk()} for _ in range(L)]})
stacked = stack_layers(packed2["layers"])["w"]
jax.block_until_ready([t.q for t in per_layer] + [stacked.q])
print(f"staged in {time.time()-t0:.1f}s; per-layer bytes "
      f"{(K*N//2 + K//32*N*4)/1e6:.1f} MB x {L}")

x0 = jnp.asarray(rng.standard_normal((1, K)), jnp.bfloat16)
layer_bytes = K * N // 2 + K // 32 * N * 4


# NOTE: weights MUST be jit ARGUMENTS, not closures — closed-over device
# arrays become jaxpr constants that ship in the remote-compile request
# (measured: 237 s warmup + HTTP 413 + 92 GB/s garbage timing).
@jax.jit
def run_unstacked(x, layers):
    def sweep(x, _):
        for t in layers:
            y = qmatmul(x, t, out_dtype=jnp.float32)          # (1, N)
            x = jnp.tile(y * 1e-6, (1, K // N)).astype(jnp.bfloat16)
        return x, ()
    x, _ = jax.lax.scan(sweep, x, None, length=REPS)
    return jnp.sum(x.astype(jnp.float32))


@jax.jit
def run_stacked(x, stk):
    def sweep(x, _):
        def body(x, li):
            y = qmatmul_stacked(x, stk, li)
            return jnp.tile(y * 1e-6, (1, K // N)).astype(jnp.bfloat16), ()
        x, _ = jax.lax.scan(body, x, jnp.arange(L, dtype=jnp.int32))
        return x, ()
    x, _ = jax.lax.scan(sweep, x, None, length=REPS)
    return jnp.sum(x.astype(jnp.float32))


for name, fn, warg in (("unstacked-loop", run_unstacked, per_layer),
                       ("stacked-scan  ", run_stacked, stacked)):
    t0 = time.time()
    _ = float(fn(x0, warg))
    print(f"{name} warmup: {time.time()-t0:.1f}s", flush=True)
    best = None
    for rep in range(3):
        t0 = time.perf_counter()
        _ = float(fn(x0, warg))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    per_gemv = best / (REPS * L)
    print(f"{name}: {per_gemv*1e3:.3f} ms/GEMV  "
          f"{layer_bytes/per_gemv/1e9:.0f} GB/s", flush=True)
