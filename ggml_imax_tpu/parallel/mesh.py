"""Device mesh construction.

The TPU-native replacement for the reference's multi-backend scheduler + RPC
remote offload (SURVEY.md §2.5/§2.9): instead of splitting a graph into
per-device subgraphs with explicit copies, we lay out a jax.sharding.Mesh and
annotate weight/activation shardings; XLA GSPMD inserts the collectives
(all-gather / reduce-scatter / all-reduce over ICI), and its latency-hiding
scheduler overlaps them with compute.

Axes:
- "dp": data parallel (batch)
- "tp": tensor parallel (feature/head dims)
Pipeline-parallel staging is deliberately not modeled in round 1 — on pod
slices TP over ICI subsumes the reference's 4-copy micro-batch pipeline.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, tp: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if tp is None:
        tp = len(devices) // dp
    assert dp * tp <= len(devices), (dp, tp, len(devices))
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def named(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
