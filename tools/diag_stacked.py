#!/usr/bin/env python
"""Stacked-layer scan decode timing on the real TPU (temporary dev tool)."""
import os
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

if os.environ.get("GGML_NO_CACHE", "0") != "1":
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parents[1] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ggml_imax_tpu.models import gptj
from ggml_imax_tpu.quant.formats import GGMLType

NL = int(sys.argv[1]) if len(sys.argv) > 1 else 4
KV = "q8_0" if "--kv=q8_0" in sys.argv else jnp.bfloat16
FUSE_FF = "--no-ff" not in sys.argv
FUSE_OUT = "--no-out" not in sys.argv

cfg = gptj.GPTJConfig(n_vocab=50400, n_ctx=512, n_embd=4096, n_head=16,
                      n_layer=NL, n_rot=64)

t0 = time.time()
params = gptj.synthetic_params_device(cfg, GGMLType.Q4_0, seed=0)
os.environ["GGML_FUSE_FF"] = "1" if FUSE_FF else "0"
params = gptj.fuse_qkv(params)
if FUSE_OUT:
    params = gptj.fuse_out(params)
from dataclasses import replace as _rp
from ggml_imax_tpu.ops.pallas_qmm import params_repack_device
h = params["lmh_w"]
vpad = (-h.n) % 128
if vpad:
    params["lmh_w"] = _rp(h, q=jnp.pad(h.q, ((0, 0), (0, vpad))),
                          scale=jnp.pad(h.scale, ((0, 0), (0, vpad))),
                          n=h.n + vpad)
    params["lmh_b"] = jnp.pad(params["lmh_b"], (0, vpad),
                              constant_values=-1e30)
sdt = {"bf16": jnp.bfloat16}.get(os.environ.get("GGML_W4A8_SCALE_DTYPE", ""),
                                 None)
params = params_repack_device(params, scale_dtype=sdt)
params = gptj.stack_model(params)
jax.block_until_ready(params)
print(f"stage+stack: {time.time()-t0:.1f}s "
      f"(ff={FUSE_FF} out={FUSE_OUT} kv={KV})")

FLAT = "--no-flat" not in sys.argv
cache = gptj.init_cache(cfg, batch=1, n_ctx=512, dtype=KV, flat=FLAT)
tok = jnp.ones((1, 1), jnp.int32)


@partial(jax.jit, static_argnames=("n",), donate_argnums=(2,))
def decode_n(params, tok, cache, start, n):
    def body(carry, i):
        tok, cache = carry
        pos = jnp.full((1, 1), start + i, jnp.int32)
        logits, cache = gptj.forward(cfg, params, tok, pos, cache, start + i)
        nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
        return (nxt, cache), ()
    (tok, cache), _ = jax.lax.scan(body, (tok, cache), jnp.arange(n))
    return tok, cache


t0 = time.time()
low = decode_n.lower(params, tok, cache, 0, n=64)
print(f"trace+lower: {time.time()-t0:.1f}s")
t0 = time.time()
comp = low.compile()
print(f"compile: {time.time()-t0:.1f}s")
t0 = time.time()
tok, cache = comp(params, tok, cache, 0)
_ = int(tok[0, 0])
print(f"first exec: {time.time()-t0:.1f}s")
best = None
for rep in range(4):
    t0 = time.perf_counter()
    tok, cache = comp(params, tok, cache, 64 * (1 + rep))
    _ = int(tok[0, 0])
    dt = time.perf_counter() - t0
    print(f"scan rep{rep}: {dt*1e3:.1f} ms ({dt/64*1e3:.3f} ms/step, "
          f"{64/dt:.1f} tok/s)")
    best = dt if best is None else min(best, dt)
print(f"BEST: {64/best:.1f} tok/s ({best/64*1e3:.3f} ms/step)")
