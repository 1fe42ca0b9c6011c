"""Headline benchmark: GPT-J-6B Q4_0 single-chip decode throughput.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference decodes GPT-J-6B at 8 tok/s on an M1 Pro CPU
(README.md:101, BASELINE.md). vs_baseline = our tok/s / 8.

Weights are synthetic (random Q4_0 blocks at the real 6B geometry) because
the sandbox has no network egress; decode cost is value-independent.
"""
from __future__ import annotations

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ggml_imax_tpu.models import gptj  # noqa: E402
from ggml_imax_tpu.quant.formats import GGMLType  # noqa: E402

BASELINE_TOK_S = 8.0  # GPT-J-6B, reference README.md:101 (125 ms/token)


def main():
    import os
    if os.environ.get("GGML_W4A8_TILES"):
        # parsed by ops.pallas_qmm at import ("BKKxBN")
        from ggml_imax_tpu.ops import pallas_qmm as _pq
        print(f"# w4a8 tiles: bkk={_pq._W4A8_BKK} bn={_pq._W4A8_BN}",
              file=sys.stderr)
    small = "--small" in sys.argv
    # stacked two-step decode is the default since r04: it beats the
    # unrolled path on every axis measured on chip (6.51 vs 6.73 ms/step
    # in-scan, TTFT 76 vs 80 ms, cold warmup 5.8 vs 69.7 s — one compiled
    # layer body instead of 28). --unrolled keeps the A/B available.
    stacked = "--unrolled" not in sys.argv or "--stacked" in sys.argv
    resident = "bf16" if "--resident=bf16" in sys.argv else "q4"
    batch = 1
    for a in sys.argv:
        if a.startswith("--batch="):
            batch = int(a.split("=")[1])
    cfg = (gptj.GPTJConfig(n_vocab=50400, n_ctx=512, n_embd=1024, n_head=16,
                           n_layer=4, n_rot=64)
           if small else
           gptj.GPTJConfig(n_vocab=50400, n_ctx=512, n_embd=4096, n_head=16,
                           n_layer=28, n_rot=64))

    t0 = time.time()
    # generated on device: staging 6B from host over the tunnel measured 100s+
    params = gptj.synthetic_params_device(cfg, GGMLType.Q4_0, seed=0)
    if resident == "bf16":
        # dequantize the Q4_0 image once on device (see quant.device
        # .to_dense_bf16 for the measured rationale)
        from ggml_imax_tpu.quant.device import params_to_dense_bf16
        params = params_to_dense_bf16(params)
    elif resident == "q4":
        # block-interleave for the fused Pallas decode kernel (measured
        # 1.2x faster than dense bf16 per GEMV at 1/4 the HBM footprint).
        # Pad the LM head's vocab dim to a 128 tile so it takes the fused
        # path too; padded logits get -1e30 bias so argmax never picks them.
        from ggml_imax_tpu.ops.pallas_qmm import params_repack_device
        # Per-32 f32 scales are ~20% of the decode weight stream; bf16
        # storage halves that (~10% less traffic). f16 would be EXACT vs
        # ggml's f16 wire scales but Mosaic has no f16 ("Unsupported type
        # in mosaic dialect: 'f16'", measured r05); bf16 rounds the scale
        # by <=2^-9 relative — negligible next to Q4_0's own ~3% weight
        # rounding (KL row re-measured in docs/QUALITY.md).
        _sdt_env = os.environ.get("GGML_W4A8_SCALE_DTYPE", "bf16")
        _sdts = {"bf16": jnp.bfloat16, "f32": None}
        assert _sdt_env in _sdts, \
            f"GGML_W4A8_SCALE_DTYPE must be bf16|f32, got {_sdt_env!r}"
        sdt = _sdts[_sdt_env]
        if sdt is not None:
            print(f"# scales stored {jnp.dtype(sdt).name}", file=sys.stderr)
        if stacked:
            os.environ.setdefault("GGML_FUSE_FF", "1")
        if os.environ.get("GGML_ROPE_SPLIT", "1") == "1":
            # split-half rope layout: q/k columns permuted once at load so
            # the rotation is two contiguous half-block FMAs (no lane
            # interleave); GGML_ROPE_SPLIT=0 keeps the interleaved A/B
            params = gptj.split_rope_prep(params, cfg)
        params = gptj.fuse_qkv(params)     # 1 GEMV for q/k/v (+fc_in) per layer
        if stacked:
            params = gptj.fuse_out(params)  # 1 GEMV for o_proj+fc_out
        # pad the LM head's vocab dim so it takes the fused path with
        # full-width n-tiles (2048 pad for the 50k vocab; padded logits get
        # -1e30 bias so argmax never picks them)
        params = gptj.pad_lm_head(params)
        params = params_repack_device(params, scale_dtype=sdt)
        if stacked:
            # scan-over-layers + fused KV-write kernel: ONE compiled layer
            # body (cold-start fix) — A/B vs the unrolled default
            params = gptj.stack_model(params)
    jax.block_until_ready(params)
    load_s = time.time() - t0
    print(f"# params staged+transferred in {load_s:.1f}s (resident={resident}"
          f"{' stacked' if stacked else ''})", file=sys.stderr)

    kv_dtype = "q8_0" if "--kv=q8_0" in sys.argv else jnp.bfloat16
    cache = gptj.init_cache(cfg, batch=batch, n_ctx=512, dtype=kv_dtype,
                            flat=stacked)

    @jax.jit
    def step(params, tok, pos, cache, n_past):
        logits, cache = gptj.forward(cfg, params, tok, pos, cache, n_past)
        # greedy next-token on device to keep sampling off the host
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        return nxt[:, None], cache

    tok = jnp.ones((batch, 1), jnp.int32)
    n_warm, n_meas = 8, 64

    if "--prefill" in sys.argv:
        # prompt-processing throughput: T=448 through the Pallas flash
        # attention + (large-m) XLA dequant-fused matmuls
        T = 448
        toks = jnp.ones((batch, T), jnp.int32)
        pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None],
                               (batch, T))

        @jax.jit
        def prefill(params, toks, pos, cache):
            logits, cache = gptj.forward(cfg, params, toks, pos, cache, 0)
            return logits[:, -1].argmax(-1).astype(jnp.int32), cache

        t0 = time.time()
        nxt, cache = prefill(params, toks, pos, cache)
        _ = int(nxt[0])
        print(f"# prefill warmup (compile): {time.time()-t0:.1f}s",
              file=sys.stderr)
        reps = 8
        t0 = time.perf_counter()
        for _ in range(reps):
            nxt, cache = prefill(params, toks, pos, cache)
        _ = int(nxt[0])
        dt = (time.perf_counter() - t0) / reps
        tps = T * batch / dt
        print(f"# prefill {T} tokens in {dt*1e3:.1f} ms", file=sys.stderr)
        print(json.dumps({
            "metric": "GPT-J-6B Q4_0 prefill tokens/sec/chip",
            "value": round(tps, 1), "unit": "tok/s",
            "vs_baseline": round(tps / BASELINE_TOK_S, 2)}))
        return

    if "--scan" in sys.argv:
        # whole decode loop on device (lax.scan + on-device argmax): one
        # dispatch per n_meas tokens — isolates device throughput from the
        # tunnel's per-call dispatch latency
        from functools import partial

        @partial(jax.jit, static_argnames=("n",))
        def decode_n(params, tok, cache, start, n):
            def body(carry, i):
                tok, cache = carry
                pos = jnp.full((batch, 1), start + i, jnp.int32)
                nxt, cache = None, cache
                logits, cache = gptj.forward(cfg, params, tok, pos, cache,
                                             start + i)
                nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
                return (nxt, cache), nxt[0, 0]
            (tok, cache), toks = jax.lax.scan(body, (tok, cache),
                                              jnp.arange(n))
            return tok, cache, toks

        # warm up the SAME executable (same static n): on the tunneled
        # runtime, an executable's FIRST run includes shipping the compiled
        # binary to the device (measured 280+ ms/step of pure artifact) —
        # warming a different n warms a different executable
        t0 = time.time()
        tok, cache, _ = decode_n(params, tok, cache, 0, n=n_meas)
        _ = int(tok[0, 0])
        print(f"# scan warmup (compile+first exec): {time.time()-t0:.1f}s",
              file=sys.stderr)
        best = None
        for rep in range(3):
            t0 = time.perf_counter()
            tok, cache, _ = decode_n(params, tok, cache,
                                     n_meas * (1 + rep), n=n_meas)
            _ = int(tok[0, 0])
            dt = time.perf_counter() - t0
            print(f"# scan rep{rep}: {dt*1e3:.1f} ms", file=sys.stderr)
            best = dt if best is None else min(best, dt)
        dt = best
        tok_s = n_meas * batch / dt
        print(f"# scan: {n_meas} tokens in {dt*1e3:.1f} ms", file=sys.stderr)
        print(json.dumps({
            "metric": f"GPT-J-6B Q4_0 decode tokens/sec/chip (fused loop)",
            "value": round(tok_s, 2), "unit": "tok/s",
            "vs_baseline": round(tok_s / BASELINE_TOK_S, 2)}))
        return

    # NOTE: on the axon tunnel backend, block_until_ready() does NOT wait for
    # execution; only a value fetch round-trips. We therefore time a chain of
    # data-dependent decode steps ended by one scalar fetch, and subtract the
    # measured fixed fetch latency.
    t0 = time.time()
    for i in range(n_warm):
        pos = jnp.full((batch, 1), i, jnp.int32)
        tok, cache = step(params, tok, pos, cache, i)
    _ = int(tok[0, 0])  # drain queue + compile
    warmup_s = time.time() - t0
    print(f"# warmup ({n_warm} steps incl. compile): {warmup_s:.1f}s",
          file=sys.stderr)

    # calibrate the fetch round-trip on a trivial dependent computation
    lat = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = int(tok[0, 0] + 0)
        lat.append(time.perf_counter() - t0)
    fetch_lat = min(lat)
    print(f"# fetch round-trip: {fetch_lat*1e3:.1f} ms", file=sys.stderr)

    best = None
    for rep in range(3):
        base = n_warm + rep * n_meas
        t0 = time.perf_counter()
        for i in range(base, base + n_meas):
            pos = jnp.full((batch, 1), i, jnp.int32)
            tok, cache = step(params, tok, pos, cache, i)
        _ = int(tok[0, 0])  # forces the whole dependent chain
        dt = time.perf_counter() - t0 - fetch_lat
        print(f"# chained rep{rep}: {dt*1e3:.1f} ms", file=sys.stderr)
        best = dt if best is None else min(best, dt)
    dt = best
    per_call_tok_s = n_meas * batch / dt
    print(f"# {n_meas} chained steps in {dt*1e3:.1f} ms (batch={batch})",
          file=sys.stderr)

    # headline: the chunked on-device decode loop (lax.scan over 64
    # data-dependent steps, argmax on device — Engine.generate's chunked
    # mode). One dispatch per 64 tokens, so the tunnel's per-call latency
    # doesn't pollute the device number; the per-call figure is reported
    # alongside as per_call_tok_s.
    from functools import partial

    @partial(jax.jit, static_argnames=("n",))
    def decode_n(params, tok, cache, start, n):
        def body(carry, i):
            tok, cache = carry
            pos = jnp.full((batch, 1), start + i, jnp.int32)
            logits, cache = gptj.forward(cfg, params, tok, pos, cache,
                                         start + i)
            nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
            return (nxt, cache), ()
        (tok, cache), _ = jax.lax.scan(body, (tok, cache), jnp.arange(n))
        return tok, cache

    start0 = n_warm + 3 * n_meas
    t0 = time.time()
    tok, cache = decode_n(params, tok, cache, start0, n=n_meas)
    _ = int(tok[0, 0])
    print(f"# scan warmup (compile+first exec): {time.time()-t0:.1f}s",
          file=sys.stderr)
    best = None
    for rep in range(3):
        t0 = time.perf_counter()
        tok, cache = decode_n(params, tok, cache,
                              start0 + n_meas * (1 + rep), n=n_meas)
        _ = int(tok[0, 0])
        dtr = time.perf_counter() - t0 - fetch_lat
        print(f"# scan rep{rep}: {dtr*1e3:.1f} ms", file=sys.stderr)
        best = dtr if best is None else min(best, dtr)
    tok_s = n_meas * batch / best
    print(f"# scan: {n_meas} tokens in {best*1e3:.1f} ms (batch={batch})",
          file=sys.stderr)

    # p50 TTFT (BASELINE.json metric string): prefill a 448-token prompt +
    # first decode step + on-device argmax, compile-cached. Measured on the
    # SAME executables a serving process would replay.
    T = 448
    toks_p = jnp.ones((batch, T), jnp.int32)
    pos_p = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (batch, T))

    @jax.jit
    def prefill(params, toks, pos, cache):
        logits, cache = gptj.forward(cfg, params, toks, pos, cache, 0)
        return logits[:, -1].argmax(-1).astype(jnp.int32)[:, None], cache

    t0 = time.time()
    ftok, cache = prefill(params, toks_p, pos_p, cache)
    _ = int(ftok[0, 0])
    print(f"# prefill compile+first: {time.time()-t0:.1f}s", file=sys.stderr)
    ttfts = []
    for _ in range(5):
        t0 = time.perf_counter()
        ftok, cache = prefill(params, toks_p, pos_p, cache)
        pos = jnp.full((batch, 1), T, jnp.int32)
        ftok, cache = step(params, ftok, pos, cache, T)
        _ = int(ftok[0, 0])
        ttfts.append(time.perf_counter() - t0)
    p50_ttft = sorted(ttfts)[len(ttfts) // 2]
    print(f"# TTFT trials (ms): {[round(t*1e3, 1) for t in ttfts]}",
          file=sys.stderr)

    name = "GPT-J-6B" if not small else "GPT-J-small"
    suffix = "" if batch == 1 else f" batch={batch}"
    print(json.dumps({
        "metric": f"{name} Q4_0 decode tokens/sec/chip{suffix}",
        "value": round(tok_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / BASELINE_TOK_S, 2),
        "per_call_tok_s": round(per_call_tok_s, 2),
        "mode": "stacked" if stacked else "unrolled",
        "p50_ttft_ms": round(p50_ttft * 1e3, 1),
        "ttft_prompt_tokens": T,
        "warmup_s": round(warmup_s, 1),
        "stage_s": round(load_s, 1),
    }))


if __name__ == "__main__":
    main()
