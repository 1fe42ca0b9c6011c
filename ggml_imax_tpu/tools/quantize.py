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
from ..io.legacy_bin import read_legacy_bin, write_legacy_bin
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
            # preserve each KV's wire type so typed readers
            # (gguf_get_val_u32 et al.) accept the requantized file
            w.add_kv(k, v, vtype=r.metadata_types.get(k))
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


def requantize_legacy_bin(src: str | Path, dst: str | Path, ttype: GGMLType,
                          hparam_names: list[str], *,
                          include=DEFAULT_INCLUDE, has_vocab: bool = True,
                          imatrix: dict | None = None) -> dict:
    """Re-encode a legacy ggml .bin model (gpt-2/gpt-j/whisper style) —
    the per-model quantize.cpp drivers' behavior (gpt-2/quantize.cpp:1-180
    over ggml_common_quantize_0). The ftype hparam is updated."""
    ttype = GGMLType(ttype)
    f = read_legacy_bin(src, hparam_names, has_vocab=has_vocab)
    stats = {}
    out_tensors = {}
    for name, tt in f.tensors.items():
        quantize_it = (
            len(tt.shape) == 2
            and tt.ggml_type in QUANTIZABLE_SRC
            and tt.ggml_type != ttype
            and any(fnmatch.fnmatch(name, pat) for pat in include)
            and tt.shape[0] % FORMATS[ttype].block_size == 0)
        if quantize_it:
            n_per_row = tt.shape[0]
            rows = int(np.prod(tt.shape)) // n_per_row
            x = codecs.dequantize(tt.data, tt.ggml_type,
                                  shape=(rows, n_per_row))
            enc = quantize_rows(x, ttype, imatrix=(imatrix or {}).get(name))
            out_tensors[name] = (ttype, tt.shape, enc)
            stats[name] = (tt.ggml_type, ttype, tt.data.nbytes, enc.nbytes)
        else:
            out_tensors[name] = (tt.ggml_type, tt.shape, tt.data)
            stats[name] = (tt.ggml_type, tt.ggml_type,
                           tt.data.nbytes, tt.data.nbytes)
    hp = dict(f.hparams)
    if "ftype" in hp:
        # GGML_QNT_VERSION(2) * 1000 + new ftype (common-ggml.cpp writes this)
        hp["ftype"] = 2000 + int(ttype)
    write_legacy_bin(dst, hp, hparam_names, f.vocab, out_tensors)
    return stats
