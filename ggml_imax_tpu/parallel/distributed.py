"""Multi-host execution — the RPC backend's replacement.

Reference: src/ggml-rpc.cpp (SURVEY §2.9) — the reference's entire
multi-node story is a TCP client/server that ships serialized tensors and
graphs to one remote device at a time; no collectives, no sharded
execution.

TPU-native: multi-host is a first-class SPMD property — every host runs the
same program, `jax.distributed.initialize` wires the hosts into one runtime
(DCN for cross-host, ICI within a slice), and the global device mesh spans
all hosts. Cross-host communication happens inside jit via XLA collectives
(psum/all_gather/reduce_scatter/ppermute over sharded arrays), not via a
hand-written transport. This module wraps process bootstrap + topology
reporting; the sharding helpers in parallel/sharding.py and the pipeline in
parallel/pipeline.py work unchanged on a multi-host mesh.
"""
from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import numpy as np
from jax.sharding import Mesh


@dataclass
class ClusterInfo:
    process_index: int
    process_count: int
    local_devices: int
    global_devices: int
    platform: str


def init(coordinator_address: str | None = None,
         num_processes: int | None = None,
         process_id: int | None = None) -> ClusterInfo:
    """Bootstrap the multi-host runtime (ggml-rpc start_rpc_server +
    client connect analog — but symmetric: every host calls this once).

    With no arguments, reads the standard env (JAX_COORDINATOR_ADDRESS /
    cloud-TPU metadata) and no-ops on single-process setups.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address or num_processes:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    return info()


def info() -> ClusterInfo:
    return ClusterInfo(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        local_devices=jax.local_device_count(),
        global_devices=jax.device_count(),
        platform=jax.devices()[0].platform,
    )


def global_mesh(axes: dict[str, int] | None = None) -> Mesh:
    """Build a mesh over ALL hosts' devices. axes: ordered {name: size};
    default one data axis spanning everything. Sizes must multiply to the
    global device count ( -1 means 'fill')."""
    n = jax.device_count()
    axes = dict(axes or {"dp": n})
    fill = [k for k, v in axes.items() if v == -1]
    if fill:
        known = int(np.prod([v for v in axes.values() if v != -1]))
        axes[fill[0]] = n // known
    shape = tuple(axes.values())
    assert int(np.prod(shape)) == n, (axes, n)
    devs = np.asarray(jax.devices()).reshape(shape)
    return Mesh(devs, tuple(axes.keys()))
