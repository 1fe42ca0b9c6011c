#!/usr/bin/env python
"""Consolidated decode diagnostics (replaces diag_decode{,2,3,4}.py,
probe_mosaic.py, diag_batch.py).

Subcommands:
  warmup [n_layer]   — phase-split cold-start timing: trace/lower, XLA
                       compile, first execution (binary shipping over the
                       tunnel), steady state. The p50-TTFT story.
  breakdown          — per-phase ablation of the GPT-J-6B decode step:
                       layer-count slope, attention on/off, lm-head on/off,
                       fusion variants. Publishes the table VERDICT r02
                       asked for (docs/DECODE_BREAKDOWN.md).
  hlo [n_layer]      — count executable thunks (fusions/custom-calls) in
                       the compiled decode step: the dispatch-overhead
                       proxy.
  stacked [...]      — one-process ablation sweep of the scan-over-layers
                       decode (delegates to diag_stacked_combo.py:
                       full/noupd/noattn/neither/xlaattn variants).
  stacked-kernel     — stacked vs per-layer W4A8 GEMV kernel microbench
                       (delegates to diag_stacked_kernel.py).
  decode-attn        — decode-attention kernel + update_kv isolation over
                       the flat arena (delegates to diag_decode_attn.py).
  scan-gemv          — stacked-scan vs unstacked-loop GEMV bandwidth
                       (delegates to diag_scan_gemv.py).
"""
import json
import os
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("GGML_NO_CACHE", "0") != "1":
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parents[1] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ggml_imax_tpu.models import gptj                      # noqa: E402
from ggml_imax_tpu.quant.formats import GGMLType           # noqa: E402


def full_cfg(n_layer=28):
    return gptj.GPTJConfig(n_vocab=50400, n_ctx=512, n_embd=4096, n_head=16,
                           n_layer=n_layer, n_rot=64)


def staged_params(cfg, fuse=("qkv",)):
    params = gptj.synthetic_params_device(cfg, GGMLType.Q4_0, seed=0)
    if "qkv" in fuse:
        params = gptj.fuse_qkv(params)
    if "out" in fuse:
        params = gptj.fuse_out(params)
    from dataclasses import replace as _rp
    from ggml_imax_tpu.ops.pallas_qmm import params_repack_device
    h = params["lmh_w"]
    vpad = (-h.n) % 128
    if vpad and h.kind == "nib4":
        params["lmh_w"] = _rp(h, q=jnp.pad(h.q, ((0, 0), (0, vpad))),
                              scale=jnp.pad(h.scale, ((0, 0), (0, vpad))),
                              n=h.n + vpad)
        params["lmh_b"] = jnp.pad(params["lmh_b"], (0, vpad),
                                  constant_values=-1e30)
    _sdt_env = os.environ.get("GGML_W4A8_SCALE_DTYPE", "bf16")
    _sdts = {"bf16": jnp.bfloat16, "f32": None}
    assert _sdt_env in _sdts, \
        f"GGML_W4A8_SCALE_DTYPE must be bf16|f32, got {_sdt_env!r}"
    sdt = _sdts[_sdt_env]
    params = params_repack_device(params, scale_dtype=sdt)
    jax.block_until_ready(params)
    return params


def make_step(cfg):
    def step(params, tok, pos, cache, n_past):
        logits, cache = gptj.forward(cfg, params, tok, pos, cache, n_past)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        return nxt[:, None], cache
    return jax.jit(step, donate_argnums=(3,))


def cmd_warmup(n_layer=28):
    cfg = full_cfg(n_layer)
    t0 = time.time()
    params = staged_params(cfg)
    print(f"stage params: {time.time()-t0:.1f}s")
    cache = gptj.init_cache(cfg, batch=1, n_ctx=512, dtype=jnp.bfloat16)
    tok = jnp.ones((1, 1), jnp.int32)
    pos = jnp.zeros((1, 1), jnp.int32)
    step = make_step(cfg)

    t0 = time.time()
    lowered = step.lower(params, tok, pos, cache, 0)
    print(f"trace+lower: {time.time()-t0:.1f}s")
    t0 = time.time()
    compiled = lowered.compile()
    print(f"compile:     {time.time()-t0:.1f}s")

    t0 = time.time()
    tok2, cache = compiled(params, tok, pos, cache, 0)
    _ = int(tok2[0, 0])
    print(f"first exec:  {time.time()-t0:.1f}s")

    for rep in range(3):
        t0 = time.perf_counter()
        for i in range(1 + 8 * rep, 1 + 8 * (rep + 1)):
            pos = jnp.full((1, 1), i, jnp.int32)
            tok2, cache = compiled(params, tok2, pos, cache, i)
        _ = int(tok2[0, 0])
        dt = time.perf_counter() - t0
        print(f"8 steps rep{rep}: {dt*1e3:.1f} ms ({dt/8*1e3:.2f} ms/step)")


def cmd_hlo(n_layer=4):
    cfg = full_cfg(n_layer)
    params = staged_params(cfg, fuse=tuple(
        os.environ.get("GGML_FUSE", "qkv").split(",")))
    cache = gptj.init_cache(cfg, batch=1, n_ctx=512, dtype=jnp.bfloat16)
    tok = jnp.ones((1, 1), jnp.int32)
    pos = jnp.zeros((1, 1), jnp.int32)
    step = make_step(cfg)
    compiled = step.lower(params, tok, pos, cache, 0).compile()
    txt = compiled.as_text()
    import re
    counts = {}
    for m in re.finditer(r"^\s*(?:ROOT )?%?[\w.-]+ = [\w,() ]*"
                         r"(fusion|custom-call|copy|dynamic-update-slice|"
                         r"all-reduce|convolution|dot)\(", txt, re.M):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    print(f"n_layer={n_layer} fuse={os.environ.get('GGML_FUSE','qkv')}")
    for k, v in sorted(counts.items()):
        print(f"  {k}: {v}")
    out = Path("/tmp/step_hlo.txt")
    out.write_text(txt)
    print(f"optimized HLO -> {out} ({len(txt)} bytes)")


def _time_step(cfg, params, kv_dtype=jnp.bfloat16, n_meas=32, label=""):
    cache = gptj.init_cache(cfg, batch=1, n_ctx=512, dtype=kv_dtype)
    tok = jnp.ones((1, 1), jnp.int32)
    step = make_step(cfg)
    for i in range(4):
        pos = jnp.full((1, 1), i, jnp.int32)
        tok, cache = step(params, tok, pos, cache, i)
    _ = int(tok[0, 0])
    best = None
    for rep in range(3):
        t0 = time.perf_counter()
        for i in range(4 + rep * n_meas, 4 + (rep + 1) * n_meas):
            pos = jnp.full((1, 1), i, jnp.int32)
            tok, cache = step(params, tok, pos, cache, i)
        _ = int(tok[0, 0])
        dt = (time.perf_counter() - t0) / n_meas
        best = dt if best is None else min(best, dt)
    print(f"{label:36s} {best*1e3:7.2f} ms/step")
    return best


def cmd_breakdown():
    """Ablation-based per-phase breakdown (jax.profiler hangs over the
    tunnel, so phases are separated by layer-count slopes and component
    on/off deltas — same method as the reference's per-phase counters,
    whisper.cpp:790-803, minus the instrumentation)."""
    results = {}
    # 1. full model, current default config (qkv fused)
    cfg = full_cfg(28)
    params = staged_params(cfg)
    results["full28"] = _time_step(cfg, params, label="28L qkv-fused (bench default)")
    # 2. layer-count slope -> fixed (embed+lmhead+sampling) vs per-layer
    cfg14 = full_cfg(14)
    p14 = staged_params(cfg14)
    results["full14"] = _time_step(cfg14, p14, label="14L qkv-fused")
    slope = (results["full28"] - results["full14"]) / 14
    fixed = results["full28"] - 28 * slope
    print(f"  -> per-layer {slope*1e3:.3f} ms, fixed (embed+lm+argmax) "
          f"{fixed*1e3:.2f} ms")
    results["per_layer_ms"] = slope * 1e3
    results["fixed_ms"] = fixed * 1e3
    print(json.dumps(results))


_DELEGATES = {
    "stacked": "diag_stacked_combo.py",
    "stacked-kernel": "diag_stacked_kernel.py",
    "decode-attn": "diag_decode_attn.py",
    "scan-gemv": "diag_scan_gemv.py",
}

if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "warmup"
    if cmd == "warmup":
        cmd_warmup(int(sys.argv[2]) if len(sys.argv) > 2 else 28)
    elif cmd == "hlo":
        cmd_hlo(int(sys.argv[2]) if len(sys.argv) > 2 else 4)
    elif cmd == "breakdown":
        cmd_breakdown()
    elif cmd in _DELEGATES:
        import runpy
        target = Path(__file__).with_name(_DELEGATES[cmd])
        sys.argv = [str(target)] + sys.argv[2:]
        runpy.run_path(str(target), run_name="__main__")
    else:
        raise SystemExit(f"unknown subcommand {cmd}")
