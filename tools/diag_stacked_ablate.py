#!/usr/bin/env python
"""Ablate components of the stacked flat-cache decode step on the chip.

GGML_ABLATE=comma-list of {attn, update, gemv} — each named component is
replaced by a cheap stand-in before the forward is traced, so the remaining
time attributes the removed cost. Run via diag_stacked.py's harness.
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

ablate = set(filter(None, os.environ.get("GGML_ABLATE", "").split(",")))

import jax.numpy as jnp  # noqa: E402

if "attn" in ablate:
    from ggml_imax_tpu.ops import decode_attention as da

    def _fake_attn(cache, li, q, mask, **kw):
        return q.astype(jnp.float32)
    da.decode_attention_stacked = _fake_attn

if "update" in ablate:
    from ggml_imax_tpu.models import common as mc
    from ggml_imax_tpu.models import gptj as gj

    def _fake_update(cache, li, k, v, n_past):
        return cache
    mc.update_kv = _fake_update
    gj.update_kv = _fake_update

if "gemv" in ablate:
    from ggml_imax_tpu.ops import qmatmul as qm

    _real = qm.qmatmul_stacked

    def _fake_gemv(x, qt, li, **kw):
        b = x.shape[:-1]
        return jnp.zeros(b + (qt.n,), jnp.float32) + jnp.sum(x) * 1e-9
    qm.qmatmul_stacked = _fake_gemv
    from ggml_imax_tpu.models import gptj as gj2  # noqa: F401

print(f"ablated: {sorted(ablate) or 'none'}")
sys.argv = [sys.argv[0]] + sys.argv[1:]
exec(compile(Path(__file__).with_name("diag_stacked.py").read_text(),
             "diag_stacked.py", "exec"))
