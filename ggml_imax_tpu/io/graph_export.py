"""Computation-graph export/import — the ggml_graph_export/import analog.

Reference: ggml_graph_export (/root/reference/src/ggml.c:19986) writes a
self-contained binary of the expanded graph (leafs + nodes + op params) that
ggml_graph_import (ggml.c:20169) re-creates and runs *without the model's
build code* — mnist uses it as a deployment artifact (examples/mnist/
main.cpp:215 -> main-cpu.cpp:42 -> main-mtl.cpp:38).

TPU-native equivalent: `jax.export` serializes the jitted function to
portable StableHLO bytes (versioned, shape-polymorphic capable). The artifact
re-loads into any future JAX process and executes on any backend — exactly
the reference's "ship the graph, not the code" deployment story, but through
the compiler's stable IR instead of a hand-rolled record format.

File format: a small JSON header (magic/version/in-tree spec) + the StableHLO
blob, so `load_graph` can report a useful error on foreign files (the
reference checks magic GGML_FILE_MAGIC the same way).
"""
from __future__ import annotations

import io
import json
import struct
from pathlib import Path

import jax
from jax import export as jax_export

MAGIC = b"GITG"          # ggml-imax-tpu graph
VERSION = 1


def _register_serializations():
    """Register the framework's pytree nodes (QTensor, KVCache) with
    jax.export so full model steps — not just plain-array graphs — can be
    shipped as artifacts (the reference exports whole cgraphs with typed
    tensor records, ggml.c:19957-19984)."""
    from ..quant.device import QTensor
    from ..models.common import KVCache
    from ..quant.formats import GGMLType

    def ser_qt(aux):
        kind, k, n, t, z, ibk, q4l, name, ns = aux
        return json.dumps([kind, k, n, int(t), z, ibk, q4l, name,
                           ns]).encode()

    def des_qt(b):
        kind, k, n, t, z, ibk, q4l, name, ns = json.loads(b.decode())
        return (kind, k, n, GGMLType(t), z, ibk, q4l, name, ns)

    try:
        jax_export.register_pytree_node_serialization(
            QTensor, serialized_name="ggml_imax_tpu.QTensor",
            serialize_auxdata=ser_qt, deserialize_auxdata=des_qt)
        jax_export.register_pytree_node_serialization(
            KVCache, serialized_name="ggml_imax_tpu.KVCache",
            serialize_auxdata=lambda aux: json.dumps(aux).encode(),
            deserialize_auxdata=lambda b: json.loads(b.decode()))
    except ValueError:
        pass                               # already registered


_register_serializations()


def export_graph(fn, example_args, path: str | Path, *,
                 platforms: tuple[str, ...] | None = None) -> None:
    """Trace fn(*example_args) and write a self-contained executable graph.

    example_args may be arrays or ShapeDtypeStructs; only shapes/dtypes are
    captured (like the reference's dims-only records, ggml.c:19957-19984).
    """
    specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jax.numpy.shape(x),
                                       jax.numpy.result_type(x)), example_args)
    exp = jax_export.export(jax.jit(fn),
                            platforms=platforms)(*specs)
    blob = exp.serialize()
    header = json.dumps({
        "version": VERSION,
        "n_in": len(example_args),
        "platforms": list(exp.platforms),
    }).encode()
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<I", len(header)))
        f.write(header)
        f.write(blob)


def load_graph(path: str | Path):
    """Read an exported graph; returns a callable running the compiled
    computation (ggml_graph_import analog, ggml.c:20169)."""
    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != MAGIC:
            raise ValueError(f"{path}: not an exported graph (magic {magic!r})")
        (hlen,) = struct.unpack("<I", f.read(4))
        header = json.loads(f.read(hlen))
        if header["version"] != VERSION:
            raise ValueError(f"unsupported graph version {header['version']}")
        blob = f.read()
    exp = jax_export.deserialize(blob)
    return exp.call
