#!/usr/bin/env python
"""Find the batch=8 decode pathology: slope (per-layer) vs fixed cost, and
an attention/no-cache ablation."""
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
NL = int(sys.argv[2]) if len(sys.argv) > 2 else 1
# small vocab: keeps lmhead out of the picture
NV = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
cfg = gptj.GPTJConfig(n_vocab=NV, n_ctx=512, n_embd=4096, n_head=16,
                      n_layer=NL, n_rot=64)

@partial(jax.jit, static_argnames=("n",))
def decode_n(params, tok, cache, n):
    def body(carry, i):
        tok, cache = carry
        pos = jnp.full((B, 1), 8 + i, jnp.int32)
        logits, cache = gptj.forward(cfg, params, tok, pos, cache, 8 + i)
        nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
        return (nxt, cache), ()
    (tok, cache), _ = jax.lax.scan(body, (tok, cache), jnp.arange(n))
    return tok, cache

params = gptj.synthetic_params_device(cfg, GGMLType.Q4_0, seed=0)
params = gptj.fuse_qkv(params)
params = pq.params_repack_device(params)
jax.block_until_ready(jax.tree.leaves(params))
cache = gptj.init_cache(cfg, batch=B, n_ctx=512, dtype=jnp.bfloat16)
tok = jnp.ones((B, 1), jnp.int32)
t0 = time.time()
tok, cache = decode_n(params, tok, cache, n=32)
_ = int(tok[0, 0])
print(f"# B={B} NL={NL}: compile+first {time.time()-t0:.0f}s", flush=True)
for rep in range(2):
    t0 = time.perf_counter()
    tok, cache = decode_n(params, tok, cache, n=32)
    _ = int(tok[0, 0])
    print(f"B={B} NL={NL} run{rep}  {(time.perf_counter()-t0)/32*1e3:8.2f} "
          "ms/step", flush=True)
