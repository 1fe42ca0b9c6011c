"""MoE op tests: mul_mat_id variants vs a naive per-token loop (the
reference's test-backend-ops mul_mat_id case, test-backend-ops.cpp:950)."""
import numpy as np
import pytest

import jax.numpy as jnp

from ggml_imax_tpu.ops.moe import (moe_ffn, mul_mat_id, mul_mat_id_grouped)


def naive(as_, x, ids):
    t, u = ids.shape
    out = np.zeros((t, u, as_.shape[2]), np.float32)
    for i in range(t):
        for s in range(u):
            out[i, s] = x[i] @ as_[ids[i, s]]
    return out


@pytest.fixture
def problem(rng):
    e, k, n, t, u = 4, 16, 8, 10, 2
    as_ = rng.standard_normal((e, k, n)).astype(np.float32)
    x = rng.standard_normal((t, k)).astype(np.float32)
    ids = rng.integers(0, e, (t, u)).astype(np.int32)
    return as_, x, ids


def test_mul_mat_id_dense(problem):
    as_, x, ids = problem
    ref = naive(as_, x, ids)
    got = np.asarray(mul_mat_id(jnp.asarray(as_), jnp.asarray(x),
                                jnp.asarray(ids)))
    np.testing.assert_allclose(ref, got, rtol=1e-5, atol=1e-5)


def test_mul_mat_id_grouped(problem):
    as_, x, ids = problem
    ref = naive(as_, x, ids)
    got = np.asarray(mul_mat_id_grouped(jnp.asarray(as_), jnp.asarray(x),
                                        jnp.asarray(ids), capacity=32))
    np.testing.assert_allclose(ref, got, rtol=1e-5, atol=1e-5)


def test_mul_mat_id_grouped_capacity_drop(rng):
    """Over-capacity tokens produce zeros, earlier tokens are kept (stable)."""
    e, k, n = 2, 8, 4
    as_ = rng.standard_normal((e, k, n)).astype(np.float32)
    x = rng.standard_normal((5, k)).astype(np.float32)
    ids = np.zeros((5, 1), np.int32)                 # all to expert 0
    got = np.asarray(mul_mat_id_grouped(jnp.asarray(as_), jnp.asarray(x),
                                        jnp.asarray(ids), capacity=3))
    ref = naive(as_, x, ids)
    np.testing.assert_allclose(ref[:3], got[:3], rtol=1e-5, atol=1e-5)
    assert np.all(got[3:] == 0)


def test_moe_ffn_routing(rng):
    """Routed FFN matches a per-token naive evaluation."""
    e_emb, f, ne, u, t = 12, 24, 4, 2, 6
    x = rng.standard_normal((t, e_emb)).astype(np.float32)
    rw = rng.standard_normal((e_emb, ne)).astype(np.float32)
    wu = rng.standard_normal((ne, e_emb, f)).astype(np.float32)
    wg = rng.standard_normal((ne, e_emb, f)).astype(np.float32)
    wd = rng.standard_normal((ne, f, e_emb)).astype(np.float32)
    got = np.asarray(moe_ffn(jnp.asarray(x), jnp.asarray(rw), jnp.asarray(wu),
                             jnp.asarray(wg), jnp.asarray(wd), n_used=u))

    def softmax(v):
        ev = np.exp(v - v.max())
        return ev / ev.sum()

    def silu(v):
        return v / (1 + np.exp(-v))

    ref = np.zeros_like(x)
    for i in range(t):
        logits = x[i] @ rw
        top = np.argsort(-logits)[:u]
        w = softmax(logits[top])
        acc = np.zeros(e_emb, np.float32)
        for s, eid in enumerate(top):
            hu = x[i] @ wu[eid]
            hg = silu(x[i] @ wg[eid])
            acc += w[s] * ((hg * hu) @ wd[eid])
        ref[i] = acc
    np.testing.assert_allclose(ref, got, rtol=1e-4, atol=1e-4)


def test_mul_mat_id_expert_parallel_mesh(rng):
    """EP (SURVEY §2.10): experts sharded across the mesh's 'ep' axis;
    GSPMD inserts the gather/collectives, result matches unsharded."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    e, k, n, t, u = 8, 16, 8, 6, 2
    as_ = rng.standard_normal((e, k, n)).astype(np.float32)
    x = rng.standard_normal((t, k)).astype(np.float32)
    ids = rng.integers(0, e, (t, u)).astype(np.int32)
    ref = naive(as_, x, ids)

    mesh = Mesh(np.array(jax.devices()[:4]), ("ep",))
    as_sharded = jax.device_put(jnp.asarray(as_),
                                NamedSharding(mesh, P("ep", None, None)))
    got = np.asarray(jax.jit(mul_mat_id)(as_sharded, jnp.asarray(x),
                                         jnp.asarray(ids)))
    np.testing.assert_allclose(ref, got, rtol=1e-5, atol=1e-5)
