#!/usr/bin/env python
"""Model quantization CLI — the per-model quantize.cpp analog
(/root/reference/examples/gpt-2/quantize.cpp driving common-ggml.cpp:41):
    python examples/quantize.py model-f16.gguf model-q4_0.gguf q4_0
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    from ggml_imax_tpu.quant.formats import GGMLType
    names = {t.name.lower(): t for t in GGMLType}
    p = argparse.ArgumentParser(description="Requantize a GGUF model")
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("type", choices=sorted(names),
                   help="target type, e.g. q4_0 q4_k q8_0")
    args = p.parse_args()

    from ggml_imax_tpu.tools.quantize import requantize_gguf
    stats = requantize_gguf(args.src, args.dst, names[args.type], verbose=True)
    n_in = sum(s[2] for s in stats.values())
    n_out = sum(s[3] for s in stats.values())
    print(f"total: {n_in/1e6:.1f} MB -> {n_out/1e6:.1f} MB "
          f"({n_out/max(1,n_in)*100:.1f}%)", file=sys.stderr)


if __name__ == "__main__":
    main()
