#!/usr/bin/env python
"""LLaMA text generation CLI (GGUF models)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from examples.common import gpt_argparser, run_generation  # noqa: E402


def main():
    args = gpt_argparser("LLaMA inference (GGUF)").parse_args()
    from ggml_imax_tpu.models import llama
    cfg, params, tok = llama.load_gguf(args.model)
    run_generation(llama, cfg, params, tok, args, eos_id=2)


if __name__ == "__main__":
    main()
