"""Model re-quantization — the quantize CLI's engine.

Reference: ggml_common_quantize_0 (/root/reference/examples/common-ggml.cpp:
41-200): walk the model's tensors; 2-D weight matrices whose names match the
to-quantize list are re-encoded to the target type (via ggml_quantize_chunk),
everything else (biases, norms, 1-D) is kept, and ftype is updated. The
per-model quantize.cpp drivers (gpt-2/quantize.cpp etc.) wrap it.
"""
from __future__ import annotations

import fnmatch
import re
from pathlib import Path

import numpy as np

from ..io.gguf import GGUFReader, GGUFWriter
from ..quant import codecs
from ..quant.formats import FORMATS, GGMLType
from ..quant.imatrix import quantize_rows

# default skip list mirrors common-ggml's behavior of only quantizing
# matmul weights: embeddings/norms/biases stay in their source precision
DEFAULT_INCLUDE = ("*.weight", "*_w", "*/w")
QUANTIZABLE_SRC = (GGMLType.F32, GGMLType.F16, GGMLType.BF16,
                   GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0,
                   GGMLType.Q5_1, GGMLType.Q8_0, GGMLType.Q2_K,
                   GGMLType.Q3_K, GGMLType.Q4_K, GGMLType.Q5_K,
                   GGMLType.Q6_K)


def requantize_gguf(src: str | Path, dst: str | Path, ttype: GGMLType, *,
                    include=DEFAULT_INCLUDE, imatrix: dict | None = None,
                    verbose: bool = False) -> dict:
    """Re-encode a GGUF model's weight matrices to `ttype`.

    imatrix: optional {tensor_name: (n_per_row,) float32} importance rows.
    Returns a stats dict {name: (src_type, dst_type, nbytes_in, nbytes_out)}.
    """
    ttype = GGMLType(ttype)
    stats = {}
    with GGUFReader(src) as r:
        w = GGUFWriter(dst)
        for k, v in r.metadata.items():
            if k == "general.alignment":
                continue
            if k == "general.file_type":
                v = int(ttype)
            w.add_kv(k, v)
        if "general.file_type" not in r.metadata:
            w.add_kv("general.file_type", int(ttype))

        for name, info in r.tensors.items():
            raw = r.tensor_data(name)
            quantize_it = (
                len(info.shape) == 2
                and info.ggml_type in QUANTIZABLE_SRC
                and info.ggml_type != ttype
                and any(fnmatch.fnmatch(name, pat) for pat in include)
                and info.shape[0] % FORMATS[ttype].block_size == 0)
            if quantize_it:
                n_per_row = info.shape[0]          # ggml ne[0] = row length
                rows = info.n_elements // n_per_row
                x = codecs.dequantize(raw, info.ggml_type,
                                      shape=(rows, n_per_row))
                imx = (imatrix or {}).get(name)
                enc = quantize_rows(x, ttype, imatrix=imx)
                w.add_tensor(name, enc, ttype, shape=info.shape)
                stats[name] = (info.ggml_type, ttype, raw.nbytes, enc.nbytes)
                if verbose:
                    print(f"  {name}: {info.ggml_type.name} -> {ttype.name} "
                          f"({raw.nbytes} -> {enc.nbytes} bytes)")
            else:
                w.add_tensor(name, raw.copy(), info.ggml_type,
                             shape=info.shape)
                stats[name] = (info.ggml_type, info.ggml_type,
                               raw.nbytes, raw.nbytes)
        w.write()
    return stats
