#!/usr/bin/env python
"""Per-op throughput benchmark — the test-backend-ops MODE_PERF analog
(/root/reference/tests/test-backend-ops.cpp:270-273, 517): times each hot op
at model-relevant shapes on the current device and prints one line per case.

Usage: python tools/bench_ops.py [-o OP] [-r REPS]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))


def timeit(fn, arg, reps):
    """Two-length differential timing: run chains of reps and 4*reps
    dependent applications and divide the difference — cancels the tunnel's
    fetch/dispatch overhead exactly (block_until_ready does not wait on
    axon; see bench.py)."""
    def chain(r):
        @jax.jit
        def f(v):
            y = v
            for _ in range(r):
                y = fn(y)
            return jax.tree.leaves(y)[0].sum()
        return f

    f1, f4 = chain(reps), chain(4 * reps)
    _ = float(f1(arg)); _ = float(f4(arg))     # compile
    t1 = min(_run(f1, arg) for _ in range(3))
    t4 = min(_run(f4, arg) for _ in range(3))
    return max(1e-9, (t4 - t1) / (3 * reps))


def _run(f, arg):
    t0 = time.perf_counter()
    _ = float(f(arg))
    return time.perf_counter() - t0


def cases(rng):
    from ggml_imax_tpu.ops.flash_attention import flash_attention
    from ggml_imax_tpu.ops.norms import layer_norm, rms_norm
    from ggml_imax_tpu.ops.pallas_qmm import (qmatmul_pallas,
                                              repack_rowpair_device)
    from ggml_imax_tpu.ops.qmatmul import qmatmul
    from ggml_imax_tpu.ops.rope import rope
    from ggml_imax_tpu.ops.softmax import soft_max_ext
    from ggml_imax_tpu.quant.device import quantize_for_device
    from ggml_imax_tpu.quant.formats import GGMLType

    K, N = 4096, 4096
    w = (rng.standard_normal((K, N)) * 0.02).astype(np.float32)
    qt = quantize_for_device(w, GGMLType.Q4_0)
    qt_rp = repack_rowpair_device(qt)
    x1 = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32))
    x512 = jnp.asarray(rng.standard_normal((512, K)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((1, 512, 16, 128)).astype(np.float32))
    attn_in = jnp.asarray(rng.standard_normal((1, 16, 512, 512)).astype(np.float32))
    pos = jnp.arange(512, dtype=jnp.int32)[None]
    hidden = jnp.asarray(rng.standard_normal((512, K)).astype(np.float32))

    gemv_bytes = K * N // 2 + K // 32 * N * 4

    def keepdim(fn, shape_like):
        return lambda v: fn(v).reshape(v.shape) if False else fn(v)

    yield ("qmatmul_pallas_rowpair gemv", lambda v: qmatmul_pallas(v, qt_rp)[:, :K],
           x1, gemv_bytes)
    yield ("qmatmul_xla_fused gemv", lambda v: qmatmul(v, qt, out_dtype=jnp.float32)[:, :K],
           x1, gemv_bytes)
    yield ("qmatmul_xla m=512", lambda v: qmatmul(v, qt, out_dtype=jnp.float32)[:, :K],
           x512, gemv_bytes)
    yield ("flash_attention 512", lambda v: flash_attention(v, q, q)[..., :],
           q, 2 * 512 * 512 * 16 * 128 * 2)
    yield ("soft_max_ext", lambda v: soft_max_ext(v, scale=0.1), attn_in,
           attn_in.size * 8)
    yield ("rope neox", lambda v: rope(v, pos, mode=2), q, q.size * 8)
    yield ("layer_norm", layer_norm, hidden, hidden.size * 8)
    yield ("rms_norm", rms_norm, hidden, hidden.size * 8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--op", default=None, help="filter by substring")
    ap.add_argument("-r", "--reps", type=int, default=32)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    dev = jax.devices()[0].platform
    print(f"# device: {dev}")
    for name, fn, arg, nbytes in cases(rng):
        if args.op and args.op not in name:
            continue
        dt = timeit(fn, arg, args.reps)
        print(f"{name:<32} {dt*1e6:10.1f} us  {nbytes/dt/1e9:8.1f} GB/s")


if __name__ == "__main__":
    main()
