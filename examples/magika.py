#!/usr/bin/env python
"""Magika file-type identification CLI — the magika example analog
(/root/reference/examples/magika/main.cpp): model.gguf file1 [file2 ...]."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser(description="Identify file types")
    p.add_argument("model", help="magika.gguf")
    p.add_argument("files", nargs="+")
    args = p.parse_args()

    from ggml_imax_tpu.models import magika
    params = magika.load_gguf(args.model)
    for f in args.files:
        top = magika.identify(params, Path(f).read_bytes())
        pretty = " ".join(f"{n}:{100*s:.0f}%" for n, s in top[:3])
        print(f"{f}: {pretty}")


if __name__ == "__main__":
    main()
