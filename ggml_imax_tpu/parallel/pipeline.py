"""Pipeline parallelism over a device mesh.

Reference: the multi-backend scheduler's micro-batch pipelining — layer
ranges assigned per backend (-ngl, gpt-2/main-sched.cpp:307-400) with
n_copies=4 in-flight input copies + events (ggml-backend.c:1066-1071,
1633-1716). That design moves tensors point-to-point between devices with
host-orchestrated splits.

TPU-native: the classic GPipe-style collective-permute pipeline inside ONE
jitted shard_map — each device along the "pp" mesh axis owns a contiguous
stage of layers (stacked params, leading axis = stage); every step each
device applies its stage to its current micro-batch and `ppermute`s the
activations to the next device. XLA overlaps the permute with compute (the
latency-hiding scheduler), playing the role of the reference's event-driven
async copies. Total steps = n_micro + n_stages - 1 (the bubble).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pipeline_forward(stage_fn, stage_params, x, mesh: Mesh, *,
                     axis: str = "pp", n_microbatch: int | None = None):
    """Run x through a layer pipeline sharded along `axis` of the mesh.

    stage_fn(params_slice, micro) -> micro : applies ONE stage (same
        computation on every device; params differ per stage).
    stage_params: pytree with leading axis n_stages on every leaf
        (stage-stacked), sharded/shardable along `axis`.
    x: (n_microbatch * B, ...) global batch; split into micro-batches.

    Returns y with x's shape. The activations' shape must be preserved by
    stage_fn (classic pipeline contract).
    """
    n_stages = mesh.shape[axis]
    n_micro = n_microbatch or n_stages
    total = x.shape[0]
    assert total % n_micro == 0, (total, n_micro)
    micros = x.reshape(n_micro, total // n_micro, *x.shape[1:])

    perm_fwd = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def stage_body(params, micros):
        # params: this device's stage slice (leading axis 1); micros: all
        # micro-batches (replicated input)
        params = jax.tree.map(lambda a: a[0], params)
        idx = jax.lax.axis_index(axis)
        n_steps = n_micro + n_stages - 1
        buf = jnp.zeros_like(micros[0])              # current activation
        outs = jnp.zeros_like(micros)

        def step(carry, t):
            buf, outs = carry
            # stage 0 ingests micro-batch t (if in range)
            feed = micros[jnp.clip(t, 0, n_micro - 1)]
            cur = jnp.where(idx == 0, feed, buf)
            live = (t - idx >= 0) & (t - idx < n_micro)
            y = stage_fn(params, cur)
            y = jnp.where(live, y, cur)
            # last stage emits micro-batch t - (n_stages - 1)
            out_t = t - (n_stages - 1)
            emit = (idx == n_stages - 1) & live
            outs = jax.lax.cond(
                emit,
                lambda o: o.at[jnp.clip(out_t, 0, n_micro - 1)].set(y),
                lambda o: o, outs)
            buf = jax.lax.ppermute(y, axis, perm_fwd)
            return (buf, outs), None

        (_, outs), _ = jax.lax.scan(step, (buf, outs),
                                    jnp.arange(n_steps))
        # broadcast the last stage's outputs to all devices
        outs = jax.lax.psum(
            jnp.where(idx == n_stages - 1, outs, jnp.zeros_like(outs)), axis)
        return outs

    spec_params = jax.tree.map(lambda _: P(axis), stage_params)
    fn = shard_map(stage_body, mesh=mesh,
                   in_specs=(spec_params, P()), out_specs=P(),
                   check_vma=False)
    outs = fn(stage_params, micros)
    return outs.reshape(total, *x.shape[1:])


def stack_stage_params(per_stage: list):
    """[stage0_params, stage1_params, ...] (same structure) -> stage-stacked
    pytree with leading axis n_stages on every leaf."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_stage)
