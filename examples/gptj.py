#!/usr/bin/env python
"""GPT-J text generation CLI — the gpt-j example analog
(/root/reference/examples/gpt-j/main.cpp)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from examples.common import gpt_argparser, run_generation  # noqa: E402


def main():
    args = gpt_argparser("GPT-J inference (legacy ggml .bin)").parse_args()
    from ggml_imax_tpu.models import gptj
    cfg, params, tok = gptj.load_legacy(args.model)
    run_generation(gptj, cfg, params, tok, args, eos_id=50256)


if __name__ == "__main__":
    main()
