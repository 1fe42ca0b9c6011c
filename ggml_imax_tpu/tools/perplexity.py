"""Perplexity harness — the PPL-delta quality gate (BASELINE.md: quantized
PPL delta must not exceed ggml's Q4_0-vs-F16 gap).

The reference has no in-repo perplexity tool (llama.cpp's perplexity example
is the canonical recipe: sliding non-overlapping windows of n_ctx tokens,
sum -log p(t_i | t_<i) over the second half of each window). This follows
that recipe; the forward is one jitted call per window.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def perplexity(model_module, cfg, params, tokens, *, n_ctx: int = 512,
               compute_dtype=jnp.bfloat16, min_context: int | None = None,
               progress=None) -> dict:
    """tokens: 1-D int array. Returns {"ppl", "nll", "n_tokens"}.
    Scores tokens whose visible context is at least min_context
    (default n_ctx//2, the llama.cpp convention)."""
    tokens = np.asarray(tokens, np.int32)
    min_context = n_ctx // 2 if min_context is None else min_context
    n_windows = len(tokens) // n_ctx
    if n_windows == 0:
        raise ValueError(f"need at least n_ctx={n_ctx} tokens, got {len(tokens)}")

    @jax.jit
    def window_nll(params, toks, cache):
        pos = jnp.arange(n_ctx, dtype=jnp.int32)[None]
        logits, _ = model_module.forward(cfg, params, toks[None], pos, cache,
                                         0, compute_dtype=compute_dtype)
        logp = jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1)
        # token i is predicted from logits at i-1
        tgt = toks[1:]
        lp = jnp.take_along_axis(logp[:-1], tgt[:, None].astype(jnp.int32),
                                 axis=1)[:, 0]
        idx = jnp.arange(n_ctx - 1)
        mask = (idx + 1) >= min_context
        return -jnp.sum(lp * mask), jnp.sum(mask)

    nll = 0.0
    count = 0
    for wi in range(n_windows):
        chunk = tokens[wi * n_ctx:(wi + 1) * n_ctx]
        cache = model_module.init_cache(cfg, batch=1, n_ctx=n_ctx,
                                        dtype=compute_dtype)
        s, c = window_nll(params, jnp.asarray(chunk), cache)
        nll += float(s)
        count += int(c)
        if progress:
            progress(wi + 1, n_windows, math.exp(nll / max(1, count)))
    return {"ppl": math.exp(nll / max(1, count)),
            "nll": nll / max(1, count), "n_tokens": count}
