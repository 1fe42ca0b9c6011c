"""Token sampling: top-k / top-p / temperature (+ repeat penalty).

Semantics follow the reference's gpt_sample_top_k_top_p[_repeat]
(/root/reference/examples/common.cpp:427-575): scale logits by 1/temp, keep
top-k, softmax over the survivors, truncate to the top-p nucleus (inclusive
of the crossing token), renormalize, draw.

Two implementations:
- `sample_host`: numpy, matches the reference flow exactly (CLI examples).
- `sample_device`: pure-jnp version usable inside jit (serving loop) with a
  jax PRNG key; uses the Gumbel trick over the filtered distribution.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def sample_host(logits: np.ndarray, *, top_k: int = 40, top_p: float = 0.9,
                temp: float = 0.9, rng: np.random.Generator | None = None,
                repeat_penalty: float = 1.0, last_tokens=()) -> int:
    rng = rng or np.random.default_rng()
    logits = np.asarray(logits, dtype=np.float64)
    n = len(logits)
    scale = 1.0 / temp if temp > 0 else 1.0

    scaled = logits * scale
    if repeat_penalty != 1.0 and len(last_tokens):
        # reference gpt_sample_top_k_top_p_repeat (common.cpp:507-575)
        for t in set(int(t) for t in last_tokens):
            if logits[t] < 0.0:
                scaled[t] = logits[t] * scale * repeat_penalty
            else:
                scaled[t] = logits[t] * scale / repeat_penalty

    top_k = min(top_k, n)
    idx = np.argpartition(-scaled, top_k - 1)[:top_k]
    idx = idx[np.argsort(-scaled[idx], kind="stable")]
    vals = scaled[idx]

    maxl = vals.max()
    probs = np.exp(vals - maxl)
    probs /= probs.sum()

    if top_p < 1.0:
        cumsum = np.cumsum(probs)
        cut = int(np.searchsorted(cumsum, top_p) + 1)
        cut = min(cut, len(probs))
        probs = probs[:cut] / cumsum[cut - 1]
        idx = idx[:cut]

    choice = rng.choice(len(probs), p=probs / probs.sum())
    return int(idx[choice])


def sample_greedy(logits) -> int:
    return int(np.argmax(np.asarray(logits)))


def sample_device(logits, key, *, top_k=40, top_p=0.9, temp=1.0,
                  k_max: int | None = None):
    """jit-friendly sampler. logits: (..., V). Returns int32 token ids (...).

    top_k / top_p / temp may each be a Python scalar (engine-wide) or an
    array broadcastable to logits[..., :1] (PER-ROW — the per-request
    sampling params of the reference's batched serving loop, common.h:114 +
    main-batched.cpp). A traced top_k is applied as a rank mask inside a
    static lax.top_k window of k_max (default 64)."""
    lf = logits.astype(jnp.float32)
    lf = lf / jnp.maximum(jnp.asarray(temp, jnp.float32), 1e-6)
    v = lf.shape[-1]

    static_k = isinstance(top_k, int)
    k_static = min(top_k if static_k else (k_max or 64), v)
    vals, idx = jax.lax.top_k(lf, k_static)                  # sorted desc
    if not static_k:
        rank = jax.lax.broadcasted_iota(jnp.int32, vals.shape, vals.ndim - 1)
        vals = jnp.where(rank < jnp.asarray(top_k, jnp.int32), vals, -jnp.inf)
    probs = jax.nn.softmax(vals, axis=-1)
    if not (isinstance(top_p, float) and top_p >= 1.0):
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens up to and including the one crossing top_p; the top-1
        # token ALWAYS survives (llama.cpp keeps >= 1 candidate — top_p <= 0
        # must mean greedy, not a uniform draw over zeroed probabilities)
        keep = (cum - probs) < jnp.asarray(top_p, jnp.float32)
        first = jax.lax.broadcasted_iota(jnp.int32, probs.shape,
                                         probs.ndim - 1) == 0
        probs = jnp.where(keep | first, probs, 0.0)
    # Gumbel-max draw over the filtered set
    g = jax.random.gumbel(key, probs.shape)
    z = jnp.log(jnp.maximum(probs, 1e-30)) + g
    pick = jnp.argmax(z, axis=-1)
    return jnp.take_along_axis(idx, pick[..., None], axis=-1)[..., 0]
