#!/usr/bin/env python
"""Honest steady-state decode timing: warm up the SAME executable (same
static n), then time repeated runs."""
import sys, time
from functools import partial
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ggml_imax_tpu.models import gptj
from ggml_imax_tpu.ops import pallas_qmm as pq
from ggml_imax_tpu.quant.formats import GGMLType

n_layer = int(sys.argv[2]) if len(sys.argv) > 2 else 4
cfg = gptj.GPTJConfig(n_vocab=50400, n_ctx=512, n_embd=4096, n_head=16,
                      n_layer=n_layer, n_rot=64)

@partial(jax.jit, static_argnames=("n",))
def decode_n(params, tok, cache, n):
    def body(carry, i):
        tok, cache = carry
        pos = jnp.full((1, 1), 8 + i, jnp.int32)
        logits, cache = gptj.forward(cfg, params, tok, pos, cache, 8 + i)
        nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
        return (nxt, cache), ()
    (tok, cache), _ = jax.lax.scan(body, (tok, cache), jnp.arange(n))
    return tok, cache

def measure(label, repack):
    params = gptj.synthetic_params_device(cfg, GGMLType.Q4_0, seed=0)
    params = gptj.fuse_qkv(params)
    params = repack(params)
    jax.block_until_ready(jax.tree.leaves(params))
    cache = gptj.init_cache(cfg, batch=1, n_ctx=512, dtype=jnp.bfloat16)
    tok = jnp.ones((1, 1), jnp.int32)
    t0 = time.time()
    tok, cache = decode_n(params, tok, cache, n=32)   # compile + first exec
    _ = int(tok[0, 0])
    print(f"# {label}: compile+first-exec {time.time()-t0:.0f}s", flush=True)
    for rep in range(3):
        t0 = time.perf_counter()
        tok, cache = decode_n(params, tok, cache, n=32)
        _ = int(tok[0, 0])
        dt = (time.perf_counter() - t0) / 32
        print(f"{label:<22} run{rep}  {dt*1e3:8.2f} ms/step", flush=True)

mode = sys.argv[1] if len(sys.argv) > 1 else "natpair"
if mode == "natpair":
    measure("natpair-w4a8", pq.params_repack_device)
elif mode == "natpair16":
    pq.set_w4a8(False)
    measure("natpair-w4a16", pq.params_repack_device)
elif mode == "rowpair":
    def rp(params):
        def conv(x):
            from ggml_imax_tpu.quant.device import QTensor
            if isinstance(x, QTensor) and x.kind == "nib4" \
                    and x.interleaved_bk == 0 and x.k % 512 == 0 \
                    and x.scale.shape[0] == x.k // 32 and x.zero in (0, 8) \
                    and x.n % 128 == 0:
                return pq.repack_rowpair_device(x)
            return x
        return jax.tree.map(conv, params,
                            is_leaf=lambda v: v is None or hasattr(v, "kind"))
    measure("rowpair-w4a16", rp)
