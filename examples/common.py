"""Shared CLI parameter handling — the gpt_params analog
(/root/reference/examples/common.h:19-45, parser common.cpp gpt_params_parse).
Flags keep the reference's names (-m/-p/-n/-s/--top_k/--top_p/--temp/-c);
-t/--threads and -ngl are accepted for CLI compatibility and noted as no-ops
(XLA owns threading; layer offload is replaced by sharding).
"""
from __future__ import annotations

import argparse
import sys
import time


def gpt_argparser(desc: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("-m", "--model", required=True, help="model file")
    p.add_argument("-p", "--prompt", default="Hello my name is")
    p.add_argument("-n", "--n_predict", type=int, default=64)
    p.add_argument("-s", "--seed", type=int, default=int(time.time()))
    p.add_argument("-c", "--ctx_size", type=int, default=0,
                   help="context size (0 = model default)")
    p.add_argument("--top_k", type=int, default=40)
    p.add_argument("--top_p", type=float, default=0.9)
    p.add_argument("--temp", type=float, default=0.9)
    p.add_argument("-b", "--batch_size", type=int, default=8)
    p.add_argument("-t", "--threads", type=int, default=0,
                   help="(compat) ignored — XLA manages device parallelism")
    p.add_argument("-ngl", "--n_gpu_layers", type=int, default=0,
                   help="(compat) ignored — use sharding for multi-chip")
    p.add_argument("--f32", action="store_true",
                   help="compute in f32 instead of bf16")
    p.add_argument("--resident",
               choices=("as-is", "q4-fused", "q4-stacked", "bf16"),
                   default="q4-fused",
                   help="device weight residency (fused Pallas q4 default)")
    return p


def run_generation(model_module, cfg, params, tok, args, eos_id=None):
    """Shared generate-and-stream loop (main-backend.cpp main loop shape)."""
    import jax.numpy as jnp
    from ggml_imax_tpu.runtime.engine import Engine

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    eng = Engine(model_module, cfg, params, compute_dtype=dtype,
                 kv_dtype=dtype, n_ctx=args.ctx_size or None,
                 residency="as-is" if args.f32 else args.resident)
    prompt_ids = tok.encode(args.prompt)
    print(f"prompt: {len(prompt_ids)} tokens | seed {args.seed}",
          file=sys.stderr)
    sys.stdout.write(args.prompt)
    sys.stdout.flush()

    def on_token(t):
        sys.stdout.write(tok.decode([t]))
        sys.stdout.flush()

    eng.generate(prompt_ids, args.n_predict, top_k=args.top_k,
                 top_p=args.top_p, temp=args.temp, seed=args.seed,
                 eos_id=eos_id, callback=on_token)
    print()
    print(eng.perf.report(), file=sys.stderr)
