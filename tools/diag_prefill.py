#!/usr/bin/env python
"""Prefill attribution (VERDICT r04 item 8): ablation + NL-slope + m-tile
sweep for the 448-token GPT-J-6B prompt pass — the DECODE_BREAKDOWN
methodology applied to prefill.

Stages the stacked fused Q4_0 weights once per layer count, then
traces/times the T=448 prefill under monkeypatched variants:

  full     - production (W4A16 m-tiled Pallas GEMMs + flash attention)
  noattn   - flash attention -> q passthrough (attributes attention)
  noelem   - noattn + layer_norm/rope as identities (pure GEMM floor)
  nolmh    - lm head matmul replaced by zeros (attributes the final
             448 x 4096 x 50400 projection)

Two layer counts give the NL slope (per-layer ms vs fixed overhead); a
DEFAULT_BM sweep checks the prefill m-tiling. Writes nothing — paste the
table into docs/PREFILL_BREAKDOWN.md. Run on the real chip:
  tools/run_chip_batch.sh prefill_diag
Reference analog: per-phase timing counters
(/root/reference/examples/whisper/whisper.cpp:790-803)."""
import os
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ggml_imax_tpu.models import gptj
from ggml_imax_tpu.ops import pallas_qmm as pq
from ggml_imax_tpu.quant.formats import GGMLType

T = int(os.environ.get("GGML_PREFILL_T", "448"))
NCTX = 512
NLS = [int(v) for v in (sys.argv[1].split(",") if len(sys.argv) > 1
                        else ["14", "28"])]
BMS = [int(v) for v in os.environ.get("GGML_PREFILL_BMS",
                                      "256,448,512").split(",")]
EMBD = int(os.environ.get("GGML_DIAG_EMBD", "4096"))
VOCAB = int(os.environ.get("GGML_DIAG_VOCAB", "50400"))

_real_attn = gptj.attention
_real_ln = gptj.layer_norm
_real_rope = gptj.rope
_real_rope_split = gptj.rope_split   # the split-layout default path —
_real_qmm = gptj.qmatmul             # must be ablated alongside gptj.rope

VARIANTS = ("full", "noattn", "noelem", "nolmh", "noln", "norope")


def set_variant(name):
    assert name in VARIANTS, f"unknown variant {name!r} (choose {VARIANTS})"
    gptj.attention = _real_attn
    gptj.layer_norm = _real_ln
    gptj.rope = _real_rope
    gptj.rope_split = _real_rope_split
    gptj.qmatmul = _real_qmm
    if name in ("noattn", "noelem"):
        gptj.attention = lambda q, k, v, mask, **kw: q.astype(jnp.float32)
    if name in ("noelem", "norope"):   # rope share (norope) / all elementwise
        gptj.rope = lambda x, pos, **kw: x
        gptj.rope_split = lambda x, pos, **kw: x
    if name in ("noelem", "noln"):     # LN share (noln) / all elementwise
        gptj.layer_norm = lambda x, g, b: x
    if name == "nolmh":
        gptj.qmatmul = lambda x, qt, **kw: \
            jnp.zeros(x.shape[:-1] + (qt.n,), jnp.float32)
    if name == "nolmh":
        gptj.qmatmul = lambda x, qt, **kw: \
            jnp.zeros(x.shape[:-1] + (qt.n,), jnp.float32)


def stage(nl):
    cfg = gptj.GPTJConfig(n_vocab=VOCAB, n_ctx=NCTX, n_embd=EMBD,
                          n_head=EMBD // 256, n_layer=nl, n_rot=64)
    t0 = time.time()
    params = gptj.synthetic_params_device(cfg, GGMLType.Q4_0, seed=0)
    os.environ["GGML_FUSE_FF"] = "1"
    params = gptj.prepare_fused(params, cfg)
    params = gptj.fuse_out(params)
    params = pq.params_repack_device(params)
    params = gptj.stack_model(params)
    jax.block_until_ready(params)
    print(f"stage NL={nl}: {time.time()-t0:.1f}s", flush=True)
    return cfg, params


def run(cfg, params, name):
    set_variant(name)
    try:
        @partial(jax.jit, donate_argnums=(3,))
        def prefill(params, toks, pos, cache):
            logits, cache = gptj.forward(cfg, params, toks, pos, cache, 0)
            return jnp.argmax(logits[:, -1], -1).astype(jnp.int32), cache

        toks = jnp.ones((1, T), jnp.int32)
        pos = jnp.arange(T, dtype=jnp.int32)[None]
        cache = gptj.init_cache(cfg, batch=1, n_ctx=NCTX,
                                dtype=jnp.bfloat16, flat=True)
        t0 = time.time()
        nxt, cache = prefill(params, toks, pos, cache)
        _ = int(nxt[0])
        tc = time.time() - t0
        # calibrate the tunnel fetch round trip (re-fetch a ready value),
        # then chain 4 prefills per fetch so the RTT is subtracted once
        lat = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = int(nxt[0])
            lat.append(time.perf_counter() - t0)
        fetch_lat = min(lat)
        best = None
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(4):
                nxt, cache = prefill(params, toks, pos, cache)
            _ = int(nxt[0])
            dt = (time.perf_counter() - t0 - fetch_lat) / 4
            best = dt if best is None else min(best, dt)
        print(f"NL={cfg.n_layer:2d} {name:7s} {best*1e3:8.2f} ms  "
              f"({T/best:7.0f} tok/s)   [compile+first {tc:.0f}s]",
              flush=True)
        return best
    finally:
        set_variant("full")


def flops(nl, with_lmh=True):
    gemm = nl * 2 * T * (EMBD * 7 * EMBD + 5 * EMBD * EMBD)
    attn = nl * 2 * 2 * T * T * EMBD          # scores + values, full mask
    lmh = 2 * T * EMBD * VOCAB if with_lmh else 0
    return gemm + attn + lmh


def main():
    results = {}
    for nl in NLS:
        cfg, params = stage(nl)
        variants = os.environ.get(
            "GGML_PREFILL_VARIANTS", "full,noattn,noelem,nolmh").split(",")
        for name in variants:
            results[(nl, name)] = run(cfg, params, name)
        if nl == max(NLS):
            for bm in BMS:
                pq.DEFAULT_BM = bm
                try:
                    dt = run(cfg, params, "full")
                    print(f"  BM={bm}: {dt*1e3:.2f} ms", flush=True)
                finally:
                    pq.DEFAULT_BM = 512
        del params

    def have(*names):
        return all((max(NLS), n) in results for n in names)

    if len(NLS) == 2 and have("full", "nolmh"):
        a, b = sorted(NLS)
        fa, fb = results[(a, "full")], results[(b, "full")]
        per_layer = (fb - fa) / (b - a)
        fixed = fa - a * per_layer
        print(f"\nNL slope: {per_layer*1e3:.3f} ms/layer, fixed "
              f"{fixed*1e3:.2f} ms (incl. lm head "
              f"{(results[(b, 'full')] - results[(b, 'nolmh')])*1e3:.2f} ms)")
    nl = max(NLS)
    if not have("full"):
        return
    full = results[(nl, "full")]
    if have("noattn", "noelem"):
        print(f"attention share: "
              f"{(full - results[(nl, 'noattn')])*1e3:.2f} ms; elementwise: "
              f"{(results[(nl, 'noattn')] - results[(nl, 'noelem')])*1e3:.2f} ms")
    if have("noln"):
        print(f"LN share: {(full - results[(nl, 'noln')])*1e3:.2f} ms")
    if have("norope"):
        print(f"rope share: {(full - results[(nl, 'norope')])*1e3:.2f} ms")
    mfu = flops(nl) / full / 197e12
    print(f"analytic FLOPs {flops(nl)/1e12:.2f} TF -> MFU "
          f"{mfu:.1%} of 197 TFLOP/s bf16 peak")


if __name__ == "__main__":
    main()
