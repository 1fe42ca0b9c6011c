"""A/B the W4A8 decode GEMV's scale storage width on chip.

Per-32 f32 scales are ~20% of the decode weight stream (GPT-J layer =
100.6 MB nibbles + 25.2 MB scales). ggml's wire format stores d as fp16
(ggml-common.h:144-149), so f16 device storage is EXACT parity for the
per-32 d formats (f16 -> f32 -> f16 round-trips bit-identically) at half
the scale traffic. This tool measures the stacked production GEMV at the
GPT-J fused-qkvf geometry with f32 / bf16 / f16 scales.

Usage: python tools/bench_scale_dtype.py [reps]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ggml_imax_tpu.ops.pallas_qmm import (  # noqa: E402
    qmatmul_natpair_w4a8_stacked, repack_natpair_device)
from ggml_imax_tpu.quant.device import QTensor, stack_layers  # noqa: E402
from ggml_imax_tpu.quant.formats import GGMLType  # noqa: E402


def make_stacked(k, n, n_layer, scale_dtype, seed=0):
    rng = np.random.default_rng(seed)
    layers = []
    for li in range(n_layer):
        qs = rng.integers(0, 256, (k // 2, n), dtype=np.uint8)
        sc = (np.abs(rng.standard_normal((k // 32, n))) * 0.01).astype(np.float32)
        qt = QTensor("nib4", qs, sc, None, k, n, GGMLType.Q4_0, zero=8)
        layers.append({"w": repack_natpair_device(qt, 512,
                                                  scale_dtype=scale_dtype)})
    return stack_layers(layers)["w"]


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    K, N, L = 4096, 28672, 4          # GPT-J fused qkvf geometry
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, K)),
                    jnp.float32)

    @jax.jit
    def chain(qt, x):
        # L dependent GEMVs -> one dispatch, mimics the scan body stream
        def body(c, li):
            y = qmatmul_natpair_w4a8_stacked(c, qt, li)
            return y[:, :K] / (1.0 + jnp.max(jnp.abs(y))), ()
        c, _ = jax.lax.scan(body, x, jnp.arange(L, dtype=jnp.int32))
        return c

    results = {}
    for name, sdt in [("f32", None), ("bf16", jnp.bfloat16),
                      ("f16", jnp.float16)]:
        try:
            qt = make_stacked(K, N, L, sdt)
            jax.block_until_ready(qt.q)
            out = chain(qt, x)
            _ = float(out[0, 0])                      # compile + first
            t0 = time.perf_counter()
            for _ in range(reps):
                out = chain(qt, x)
            _ = float(out[0, 0])
            dt = (time.perf_counter() - t0) / reps / L
            sbytes = 2 if sdt is not None else 4
            mb = (K * N // 2 + (K // 32) * N * sbytes) / 1e6
            gbs = mb / 1e3 / dt
            results[name] = (dt * 1e3, gbs)
            print(f"{name:5s}: {dt*1e6:8.1f} us/GEMV  "
                  f"({mb:.1f} MB -> {gbs:.0f} GB/s eff)")
        except Exception as e:  # noqa: BLE001
            print(f"{name:5s}: FAILED — {type(e).__name__}: {e}")
        finally:
            qt = None
    # exactness check: f16 storage of an f16-wire scale is bit-exact
    d16 = np.float16(0.0123)
    assert np.float16(np.float32(d16)) == d16
    return results


if __name__ == "__main__":
    main()
