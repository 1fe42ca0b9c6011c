"""Ring-attention long-context prefill (parallel/tp.py forward_ring_prefill)
vs the single-device stacked path.

The tp×sp mesh shards weights/heads over tp (same placement as forward_tp)
and the SEQUENCE over sp: each device computes q/k/v for its own token
chunk, writes only its shard of the KV arena (the full-context cache never
exists on one device), and attends over the global context by rotating KV
chunks around the sp ring with absolute-position causal masks
(ring_attention_local). Logits and the reassembled cache must match the
single-device run. No reference counterpart — the reference's context is
bounded by one device's KV preallocation (SURVEY.md §5)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ggml_imax_tpu.models import gptj
from ggml_imax_tpu.ops.pallas_qmm import params_repack_device
from ggml_imax_tpu.ops.qmatmul import set_force_fused
from ggml_imax_tpu.parallel.tp import (forward_ring_prefill,
                                       init_cache_ringsp, shard_params_tp)
from ggml_imax_tpu.quant.formats import GGMLType

TP, SP = 2, 4


def _cfg():
    # E/tp = 128 keeps the fused kernels' lane alignment on both sides
    return gptj.GPTJConfig(n_vocab=1024, n_ctx=32, n_embd=256, n_head=8,
                           n_layer=2, n_rot=32)


def _fused_stacked_params(cfg, tp):
    os.environ["GGML_FUSE_FF"] = "1"
    params = gptj.synthetic_params(cfg, GGMLType.Q4_0, seed=11)
    params = gptj.fuse_qkv(params)
    params = gptj.fuse_out(params)
    params = gptj.pad_lm_head(params, multiple=128 * tp)
    params = params_repack_device(params)
    return gptj.stack_model(params)


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    assert len(devs) >= TP * SP
    return Mesh(np.array(devs[:TP * SP]).reshape(TP, SP), ("tp", "sp"))


def test_ring_prefill_matches_single_device(mesh):
    cfg = _cfg()
    T = 32                                   # == arena n_ctx; T/sp = 8
    set_force_fused(True)
    try:
        ref_params = _fused_stacked_params(cfg, TP)
        rp_params, specs = shard_params_tp(_fused_stacked_params(cfg, TP),
                                           mesh, cfg)
        rng = np.random.default_rng(5)
        toks = jnp.asarray(rng.integers(0, cfg.n_vocab, (1, T)), jnp.int32)
        pos = jnp.asarray(np.arange(T, dtype=np.int32)[None])

        c1 = gptj.init_cache(cfg, batch=1, n_ctx=T, flat=True)
        l1, c1 = gptj.forward(cfg, ref_params, toks, pos, c1, 0)

        cr = init_cache_ringsp(cfg, mesh, batch=1, n_ctx=T)
        assert cr.heads == cfg.n_head // TP
        # no single device holds more than T/sp rows of the arena
        assert cr.k.addressable_shards[0].data.shape[2] == T // SP
        lr, cr = forward_ring_prefill(cfg, rp_params, toks, pos, cr, mesh,
                                      specs)
        assert lr.shape == l1.shape == (1, T, cfg.n_vocab)
        # ring-merge (logaddexp) + K-sharded contractions reassociate f32
        # partials; ~8e-3 max abs observed at this geometry
        np.testing.assert_allclose(np.asarray(lr), np.asarray(l1),
                                   rtol=1e-2, atol=1e-2)

        # the sp-sharded arena reassembles to the single-device cache:
        # shard i's local rows [0, T/sp) are global rows [i*T/sp, ...)
        np.testing.assert_allclose(
            np.asarray(cr.k, dtype=np.float32),
            np.asarray(c1.k, dtype=np.float32), rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(
            np.asarray(cr.v, dtype=np.float32),
            np.asarray(c1.v, dtype=np.float32), rtol=2e-2, atol=2e-2)
    finally:
        set_force_fused(False)
