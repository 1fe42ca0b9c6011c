#!/usr/bin/env python
"""Split the stacked-decode attention cost: kernel vs update_kv vs both,
scanned over 28 layers at GPT-J-6B geometry with a flat q8_0 KV arena."""
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ggml_imax_tpu.models.common import init_kv_cache, update_kv
from ggml_imax_tpu.ops.decode_attention import decode_attention_stacked

L, B, T, H, D = 28, 1, 512, 16, 256
KV = "q8_0" if "--kv=q8_0" in sys.argv else jnp.bfloat16
FLAT = "--no-flat" not in sys.argv
MODE = next((a.split("=")[1] for a in sys.argv if a.startswith("--mode=")),
            "both")  # attn | update | both
STEPS = 64

cache = init_kv_cache(L, B, T, H, D, dtype=KV, flat=FLAT)
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.bfloat16)
kv_new = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.bfloat16)
mask = jnp.zeros((B, T), jnp.float32)

kv_bytes_layer = 2 * T * H * D * (1 if KV == "q8_0" else 2) \
    + (2 * T * H * (D // 32) * 4 if KV == "q8_0" else 0)


@partial(jax.jit, donate_argnums=(0,), static_argnames=("n",))
def run(cache, q, kv_new, mask, n):
    def step(carry, i):
        cache, acc = carry
        def layer(c2, li):
            cache, acc = c2
            if MODE in ("update", "both"):
                cache = update_kv(cache, li, kv_new, kv_new, i % (T - 1))
            if MODE in ("attn", "both"):
                o = decode_attention_stacked(cache, li, q, mask)
                acc = acc + jnp.sum(o)
            return (cache, acc), None
        (cache, acc), _ = jax.lax.scan(
            layer, (cache, acc), jnp.arange(L, dtype=jnp.int32))
        return (cache, acc), None
    (cache, acc), _ = jax.lax.scan(step, (cache, jnp.float32(0)),
                                   jnp.arange(n))
    return cache, acc


t0 = time.time()
cache, acc = run(cache, q, kv_new, mask, STEPS)
_ = float(acc)
print(f"mode={MODE} kv={KV} flat={FLAT}  compile+first: {time.time()-t0:.1f}s")
best = None
for rep in range(4):
    t0 = time.perf_counter()
    cache, acc = run(cache, q, kv_new, mask, STEPS)
    _ = float(acc)
    dt = (time.perf_counter() - t0) / STEPS
    gbs = L * kv_bytes_layer / dt / 1e9
    print(f"rep{rep}: {dt*1e3:.3f} ms/step  ({dt/L*1e6:.0f} us/layer, "
          f"{gbs:.0f} GB/s KV stream)")
    best = dt if best is None else min(best, dt)
print(f"BEST: {best*1e3:.3f} ms/step")
