#!/usr/bin/env python
"""Decode-regression bisect: lm-head-shaped GEMV (bn=256 grid) + scan-based
2-layer step under each layout."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ggml_imax_tpu.ops.pallas_qmm import (qmatmul_pallas, set_w4a8,
                                          repack_natpair_device,
                                          repack_rowpair_device)
from ggml_imax_tpu.quant.device import quantize_for_device
from ggml_imax_tpu.quant.formats import GGMLType

rng = np.random.default_rng(0)

def timeit(fn, reps=16):
    def chain(r):
        @jax.jit
        def f(seed):
            def body(s, _):
                out = fn(s)
                return out.reshape(-1)[0] * jnp.float32(1e-30), ()
            s, _ = jax.lax.scan(body, seed, None, length=r)
            return s
        return f
    f1, f4 = chain(reps), chain(4 * reps)
    s0 = jnp.float32(0.0)
    _ = float(f1(s0)); _ = float(f4(s0))
    def run(f):
        t0 = time.perf_counter(); _ = float(f(s0))
        return time.perf_counter() - t0
    t1 = min(run(f1) for _ in range(3))
    t4 = min(run(f4) for _ in range(3))
    return max(1e-9, (t4 - t1) / (3 * reps))

# lm-head shape: K=4096, N=50432 -> bn falls back to 256
K, N = 4096, 50432
w = (rng.standard_normal((K, N)) * 0.02).astype(np.float32)
qt = repack_natpair_device(quantize_for_device(w, GGMLType.Q4_0))
jax.block_until_ready(qt.q)
x = jnp.asarray((rng.standard_normal((1, K)) * 0.5).astype(np.float32))
nbytes = K * N // 2 + K // 32 * N * 4
dt = timeit(lambda s: qmatmul_pallas(x + s, qt))
print(f"lmhead natpair-w4a8 (bn=256) {dt*1e6:9.1f} us "
      f"{nbytes/dt/1e9:7.1f} GB/s", flush=True)
set_w4a8(False)
dt = timeit(lambda s: qmatmul_pallas(x + s, qt))
set_w4a8(True)
print(f"lmhead natpair-w4a16         {dt*1e6:9.1f} us "
      f"{nbytes/dt/1e9:7.1f} GB/s", flush=True)
del qt
qt = repack_rowpair_device(quantize_for_device(w, GGMLType.Q4_0))
jax.block_until_ready(qt.q)
dt = timeit(lambda s: qmatmul_pallas(x + s, qt))
print(f"lmhead rowpair-w4a16         {dt*1e6:9.1f} us "
      f"{nbytes/dt/1e9:7.1f} GB/s", flush=True)
