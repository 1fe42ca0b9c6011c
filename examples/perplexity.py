#!/usr/bin/env python
"""Perplexity evaluation CLI (the PPL quality gate, BASELINE.md)."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser(description="Compute perplexity on a text file")
    p.add_argument("-m", "--model", required=True, help="GGUF (llama) model")
    p.add_argument("-f", "--file", required=True, help="UTF-8 text file")
    p.add_argument("-c", "--ctx_size", type=int, default=512)
    p.add_argument("--f32", action="store_true")
    args = p.parse_args()

    import jax.numpy as jnp
    from ggml_imax_tpu.models import llama
    from ggml_imax_tpu.tools.perplexity import perplexity

    cfg, params, tok = llama.load_gguf(args.model)
    text = Path(args.file).read_text()
    toks = tok.encode(text)
    print(f"{len(toks)} tokens", file=sys.stderr)
    res = perplexity(llama, cfg, params, toks, n_ctx=args.ctx_size,
                     compute_dtype=jnp.float32 if args.f32 else jnp.bfloat16,
                     progress=lambda i, n, ppl: print(
                         f"[{i}/{n}] ppl={ppl:.4f}", file=sys.stderr))
    print(f"perplexity: {res['ppl']:.4f} over {res['n_tokens']} tokens")


if __name__ == "__main__":
    main()
