#!/usr/bin/env python
"""Continuous-batching demo — the main-batched example analog
(/root/reference/examples/gpt-2/main-batched.cpp): decode -np parallel
sequences from one prompt through the celled KV cache."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from examples.common import gpt_argparser  # noqa: E402


def main():
    ap = gpt_argparser("Parallel generation via continuous batching (GPT-2)")
    ap.add_argument("-np", "--n_parallel", type=int, default=4)
    args = ap.parse_args()

    import jax.numpy as jnp
    from ggml_imax_tpu.models import gpt2
    from ggml_imax_tpu.runtime.batched import BatchedEngine

    cfg, params, tok = gpt2.load_legacy(args.model)
    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    be = BatchedEngine(gpt2, cfg, params, compute_dtype=dtype, kv_dtype=dtype,
                       n_ctx=args.ctx_size or None)
    prompt = tok.encode(args.prompt)
    rid0 = be.add_request(prompt, args.n_predict, temp=args.temp,
                          top_k=args.top_k, top_p=args.top_p, seed=args.seed)
    be.step()                                    # shared prefill
    rids = [rid0] + [be.fork(rid0, seed=args.seed + i)
                     for i in range(1, args.n_parallel)]
    outs = be.run()
    for i, rid in enumerate(rids):
        print(f"--- sequence {i} ---")
        print(args.prompt + tok.decode(outs[rid]))


if __name__ == "__main__":
    main()
