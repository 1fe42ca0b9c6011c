#!/usr/bin/env python
"""Serving-step attribution: where does the batch-8 CELLED decode step
spend its time vs the flat batched-engine ceiling (README 592.9 tok/s)?

Times BatchedEngine.step_chunk dispatches at GPT-J-6B geometry with 8
prefilled requests under ablations:

  prod       - production (celled kernel, per-request top-k sampling)
  greedy     - sample_device -> argmax (attributes the on-device top-k
               sampler: top-64 over (8, 50400) per step)
  noattn     - cells attention -> q passthrough (attributes the celled
               arena read at this n_ctx)

Run at two n_ctx (2048/4096) to attribute the cell-pool size. Usage:
  python tools/diag_serving.py [n_ctx ...]
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ggml_imax_tpu.models import gptj
from ggml_imax_tpu.quant.formats import GGMLType
from ggml_imax_tpu.runtime import batched as B
from ggml_imax_tpu.ops import sampling as S
from ggml_imax_tpu.ops import decode_attention as DA

NCTXS = [int(v) for v in (sys.argv[1:] or ["2048", "4096"])]
N_REQ, CHUNK, STEPS, PLEN = 8, 8, 4, 96
tiny = os.environ.get("GGML_SERVE_BENCH_TINY") == "1"

if tiny:
    cfg = gptj.GPTJConfig(n_vocab=256, n_ctx=256, n_embd=256, n_head=8,
                          n_layer=2, n_rot=32)
    NCTXS = [256]
    N_REQ, CHUNK, STEPS, PLEN = 3, 4, 2, 8
else:
    cfg = gptj.GPTJConfig(n_vocab=50400, n_ctx=4096, n_embd=4096, n_head=16,
                          n_layer=28, n_rot=64)

t0 = time.time()
params = gptj.synthetic_params_device(cfg, GGMLType.Q4_0, seed=0)
jax.block_until_ready(jax.tree.leaves(params))
print(f"# staged in {time.time()-t0:.0f}s", flush=True)

_real_sample = S.sample_device
_real_cells = DA.decode_attention_cells

ABLATIONS = {
    "prod": lambda: None,
    "greedy": lambda: setattr(
        S, "sample_device",
        lambda lg, key, **kw: jnp.argmax(lg, -1).astype(jnp.int32)),
    "noattn": lambda: setattr(
        DA, "decode_attention_cells",
        lambda cache, li, q, mask, **kw: q.astype(jnp.float32)),
}


def reset():
    S.sample_device = _real_sample
    DA.decode_attention_cells = _real_cells


def measure(n_ctx, name):
    reset()
    ABLATIONS[name]()
    try:
        be = B.BatchedEngine(gptj, cfg, params, n_ctx=n_ctx, kv_dtype="q8_0",
                             on_device_sampling=True, seed=1, stacked=True)
        rng = np.random.default_rng(0)
        for i in range(N_REQ):
            be.add_request(list(rng.integers(0, cfg.n_vocab - 1, PLEN)),
                           10_000, temp=0.8, top_k=40, top_p=0.95, seed=i)
        while any(r.n_prompt_done < len(r.prompt) or
                  (r.next_tok is None and r.logits is None)
                  for r in be.requests.values()):
            be.step()
        be.step_chunk(CHUNK)                      # compile the chunk shape
        best = None
        for _ in range(STEPS):
            t0 = time.perf_counter()
            be.step_chunk(CHUNK)
            dt = (time.perf_counter() - t0) / CHUNK
            best = dt if best is None else min(best, dt)
        gen = sum(len(r.out) for r in be.requests.values())
        print(f"n_ctx={n_ctx} {name:7s} {best*1e3:7.2f} ms/step "
              f"({N_REQ/best:6.0f} tok/s aggregate)  [gen={gen}]",
              flush=True)
        del be.cache, be
    finally:
        reset()
        import gc
        gc.collect()


for n_ctx in NCTXS:
    for name in ABLATIONS:
        measure(n_ctx, name)
