#!/usr/bin/env python
"""One-process ablation sweep of the stacked flat-cache decode step.

Stages weights once, then traces/compiles/times several variants of the
64-step decode scan, monkeypatching components between traces:

  full        - fused KV-write+attention kernel (GGML_FUSED_KV_UPDATE=1)
  twostep     - XLA dynamic-update-slice + read-only attention kernel
                (the production default since r04)
  noupd       - update_kv replaced by identity (kernel reads stale arena)
  noattn      - decode-attention kernel replaced by q passthrough (update runs)
  neither     - both ablated (pure GEMV + norms floor)
  noelem      - neither + layer_norm/rope as identities (pure GEMV floor;
                neither-noelem attributes the elementwise VPU ops)
  xlaattn     - use_kernel forced off (DUS + XLA-path attention)

The deltas attribute the ms/step between the GEMV stream, the KV update
(DUS-in-scan aliasing), and the attention kernel read.
"""
import os
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # sitecustomize registers axon and clobbers jax_platforms; undo for
    # CPU validation runs (same trick as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ggml_imax_tpu.models import gptj
from ggml_imax_tpu.models import common as mc
from ggml_imax_tpu.ops import decode_attention as da
from ggml_imax_tpu.quant.formats import GGMLType

NL = int(sys.argv[1]) if len(sys.argv) > 1 else 28
NCTX = int(sys.argv[2]) if len(sys.argv) > 2 else 512
VARIANTS = sys.argv[3].split(",") if len(sys.argv) > 3 else [
    "full", "twostep", "noupd", "noattn", "neither", "xlaattn"]
# full    = fused KV-write+attention kernel (production default)
# twostep = XLA dynamic-update-slice + read-only attention kernel (r02 path)

EMBD = int(os.environ.get("GGML_DIAG_EMBD", "4096"))
VOCAB = int(os.environ.get("GGML_DIAG_VOCAB", "50400"))
cfg = gptj.GPTJConfig(n_vocab=VOCAB, n_ctx=NCTX, n_embd=EMBD,
                      n_head=max(1, EMBD // 256), n_layer=NL, n_rot=64)

t0 = time.time()
params = gptj.synthetic_params_device(cfg, GGMLType.Q4_0, seed=0)
os.environ["GGML_FUSE_FF"] = "1"
params = gptj.prepare_fused(params, cfg)      # fuse_qkv(+ff), pad lm head
params = gptj.fuse_out(params)
from ggml_imax_tpu.ops.pallas_qmm import params_repack_device
params = params_repack_device(params)
params = gptj.stack_model(params)
jax.block_until_ready(params)
print(f"stage+stack: {time.time()-t0:.1f}s  NL={NL} n_ctx={NCTX}", flush=True)

tok0 = jnp.ones((1, 1), jnp.int32)

_real_update = mc.update_kv
_real_attn = da.decode_attention_stacked
_gptj_update = gptj.update_kv
_real_ln = gptj.layer_norm
_real_rope = gptj.rope
_real_rope_split = gptj.rope_split   # split-layout default (split_rope_prep)


def set_variant(name):
    mc.update_kv = _real_update
    gptj.update_kv = _gptj_update
    da.decode_attention_stacked = _real_attn
    gptj.layer_norm = _real_ln
    gptj.rope = _real_rope
    gptj.rope_split = _real_rope_split
    import ggml_imax_tpu.ops.qmatmul as qm
    qm._force_fused = False
    os.environ["GGML_FUSED_KV_UPDATE"] = "1" if name == "full" else "0"
    force_xla = False
    if name in ("noupd", "neither"):
        fake_upd = lambda cache, li, k, v, n_past: cache
        mc.update_kv = fake_upd
        gptj.update_kv = fake_upd
    if name in ("noattn", "neither", "noelem"):
        da.decode_attention_stacked = \
            lambda cache, li, q, mask, **kw: q.astype(jnp.float32)
    if name == "noelem":
        fake_upd = lambda cache, li, k, v, n_past: cache
        mc.update_kv = fake_upd
        gptj.update_kv = fake_upd
        gptj.layer_norm = lambda x, g, b: x
        gptj.rope = lambda x, pos, **kw: x
        gptj.rope_split = lambda x, pos, **kw: x
    if name == "xlaattn":
        force_xla = True
    return force_xla


def run_variant(name):
    force_xla = set_variant(name)
    cache = gptj.init_cache(cfg, batch=1, n_ctx=NCTX, dtype=jnp.bfloat16,
                            flat=True)
    if force_xla:
        # defeat the T==1 kernel gate by patching platform check
        import ggml_imax_tpu.models.gptj as gj

        orig_fwd = gj._forward_stacked

        def fwd(cfg_, params_, tokens, positions, cache_, n_past, **kw):
            import jax as _j
            real = _j.devices
            class FakeDev:
                platform = "cpu"
            _j.devices = lambda *a, **k: [FakeDev()]
            try:
                return orig_fwd(cfg_, params_, tokens, positions, cache_,
                                n_past, **kw)
            finally:
                _j.devices = real
        gj._forward_stacked = fwd
    try:
        @partial(jax.jit, static_argnames=("n",), donate_argnums=(2,))
        def decode_n(params, tok, cache, start, n):
            def body(carry, i):
                tok, cache = carry
                pos = jnp.full((1, 1), start + i, jnp.int32)
                logits, cache = gptj.forward(cfg, params, tok, pos, cache,
                                             start + i)
                nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
                return (nxt, cache), ()
            (tok, cache), _ = jax.lax.scan(body, (tok, cache), jnp.arange(n))
            return tok, cache

        t0 = time.time()
        comp = decode_n.lower(params, tok0, cache, 0, n=64).compile()
        tc = time.time() - t0
        t0 = time.time()
        tok, cache = comp(params, tok0, cache, 0)
        _ = int(tok[0, 0])
        te = time.time() - t0
        best = None
        for rep in range(3):
            t0 = time.perf_counter()
            tok, cache = comp(params, tok, cache, 64 * (1 + rep))
            _ = int(tok[0, 0])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name:8s} {best/64*1e3:8.3f} ms/step  ({64/best:6.1f} tok/s)"
              f"   [compile {tc:.0f}s, first-exec {te:.0f}s]", flush=True)
    finally:
        if force_xla:
            gj._forward_stacked = orig_fwd
        set_variant("full")


# Optional W4A8 tile sweep: GGML_TILE_SWEEP="2048x2048,1024x2048,..." times
# every variant at each (bkk, bn) kernel tiling. Weights are staged once —
# the natpair layout is tile-independent, only the BlockSpecs change.
_sweep = os.environ.get("GGML_TILE_SWEEP", "")
if _sweep:
    from ggml_imax_tpu.ops.pallas_qmm import set_w4a8_tiles
    for tile in _sweep.split(","):
        bkk, bn = (int(t) for t in tile.split("x"))
        set_w4a8_tiles(bkk, bn)
        print(f"--- tiles bkk={bkk} bn={bn}", flush=True)
        for v in VARIANTS:
            run_variant(v)
else:
    for v in VARIANTS:
        run_variant(v)
