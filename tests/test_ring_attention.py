"""Ring attention (sequence-parallel) vs single-device full attention on
the 8-device CPU mesh — the designed-fresh long-context extension
(SURVEY §5: the reference has no SP/ring attention)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ggml_imax_tpu.ops.attention import attention_xla, causal_mask
from ggml_imax_tpu.parallel.ring_attention import ring_attention


def mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("sp",))


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_ring_matches_full(rng, n_dev):
    b, tq, tk, h, d = 1, 16, 64, 2, 32
    q = jnp.asarray(rng.standard_normal((b, tq, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, tk, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, tk, h, d)).astype(np.float32))
    ref = attention_xla(q, k, v, None, out_dtype=jnp.float32)
    got = ring_attention(q, k, v, mesh(n_dev))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=2e-4, atol=2e-5)


def test_ring_causal(rng):
    b, t, h, d = 2, 32, 2, 16
    q = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    m = causal_mask(t, t, 0)[None, None]
    ref = attention_xla(q, k, v, m, out_dtype=jnp.float32)
    got = ring_attention(q, k, v, mesh(4), causal=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=2e-4, atol=2e-5)


def test_ring_decode_against_kv_shards(rng):
    """Decode-style: 1 query attending over a long sharded KV with explicit
    positions (the sequence-sharded KV-cache serving shape)."""
    b, tk, h, d = 1, 128, 4, 16
    q = jnp.asarray(rng.standard_normal((b, 1, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, tk, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, tk, h, d)).astype(np.float32))
    qpos = jnp.full((b, 1), 100, jnp.int32)
    kpos = jnp.broadcast_to(jnp.arange(tk)[None], (b, tk))
    m = jnp.where(kpos[:, None, None, :] <= qpos[:, None, :, None],
                  0.0, -jnp.inf)
    ref = attention_xla(q, k, v, m.reshape(b, 1, 1, tk), out_dtype=jnp.float32)
    got = ring_attention(q, k, v, mesh(8), causal=True,
                         q_positions=qpos, kv_positions=kpos)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=2e-4, atol=2e-5)
