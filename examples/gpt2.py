#!/usr/bin/env python
"""GPT-2 text generation CLI — the gpt-2-backend example analog
(/root/reference/examples/gpt-2/main-backend.cpp)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from examples.common import gpt_argparser, run_generation  # noqa: E402


def main():
    args = gpt_argparser("GPT-2 inference (legacy ggml .bin)").parse_args()
    from ggml_imax_tpu.models import gpt2
    cfg, params, tok = gpt2.load_legacy(args.model)
    run_generation(gpt2, cfg, params, tok, args)


if __name__ == "__main__":
    main()
