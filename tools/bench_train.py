#!/usr/bin/env python
"""Training-step throughput: forward + backward + AdamW on real hardware.

Exercises the full autodiff path on the TPU — including the Pallas flash
attention custom_vjp (ops/flash_backward.py, the GGML_OP_FLASH_ATTN_BACK
analog) which the CPU suite only runs in interpret mode. Model: GPT-2
geometry (117M-ish) with dense bf16 weights (training runs on dense
mirrors; quantized weights are frozen inference artifacts, as in the
reference's ggml_opt flow).

Prints one JSON line: {"metric": "train tokens/sec", ...}.
Usage: python tools/bench_train.py [--small]
"""
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ggml_imax_tpu.ops.flash_attention import flash_attention
from ggml_imax_tpu.ops.norms import layer_norm
from ggml_imax_tpu.ops.activations import gelu


def main():
    small = "--small" in sys.argv
    L, E, H = (2, 256, 4) if small else (12, 768, 12)
    V, T, B = 50304, 512, 8
    D = E // H

    key = jax.random.key(0)

    def glorot(k, shape):
        return (jax.random.normal(k, shape, jnp.float32)
                * (2.0 / sum(shape[-2:])) ** 0.5).astype(jnp.bfloat16)

    keys = iter(jax.random.split(key, 8 * L + 8))
    params = {
        "wte": glorot(next(keys), (V, E)),
        "wpe": glorot(next(keys), (1024, E)),
        "lng": jnp.ones((E,), jnp.float32), "lnb": jnp.zeros((E,), jnp.float32),
        "layers": [{
            "ln1g": jnp.ones((E,), jnp.float32), "ln1b": jnp.zeros((E,), jnp.float32),
            "ln2g": jnp.ones((E,), jnp.float32), "ln2b": jnp.zeros((E,), jnp.float32),
            "qkv": glorot(next(keys), (E, 3 * E)),
            "proj": glorot(next(keys), (E, E)),
            "fc": glorot(next(keys), (E, 4 * E)),
            "out": glorot(next(keys), (4 * E, E)),
        } for _ in range(L)],
    }

    def forward(p, toks):
        x = p["wte"][toks].astype(jnp.float32) + p["wpe"][:T][None]
        mask = jnp.where(jnp.arange(T)[None, :] <= jnp.arange(T)[:, None],
                         0.0, -jnp.inf).astype(jnp.float32)[None, None]
        for lp in p["layers"]:
            cur = layer_norm(x, lp["ln1g"], lp["ln1b"])
            qkv = (cur.astype(jnp.bfloat16) @ lp["qkv"]).reshape(B, T, 3, H, D)
            # Pallas flash attention WITH its custom-vjp backward kernels
            attn = flash_attention(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2],
                                   mask, out_dtype=jnp.bfloat16)
            x = x + (attn.reshape(B, T, E) @ lp["proj"]).astype(jnp.float32)
            cur = layer_norm(x, lp["ln2g"], lp["ln2b"])
            h = gelu((cur.astype(jnp.bfloat16) @ lp["fc"]).astype(jnp.float32))
            x = x + (h.astype(jnp.bfloat16) @ lp["out"]).astype(jnp.float32)
        x = layer_norm(x, p["lng"], p["lnb"])
        return (x.astype(jnp.bfloat16) @ p["wte"].T).astype(jnp.float32)

    opt = optax.adamw(1e-4)

    def loss_fn(p, toks, tgts):
        logits = forward(p, toks)
        lp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.take_along_axis(lp, tgts[..., None], axis=-1).mean()

    @jax.jit
    def train_step(p, state, toks, tgts):
        loss, g = jax.value_and_grad(loss_fn)(p, toks, tgts)
        upd, state = opt.update(g, state, p)
        return optax.apply_updates(p, upd), state, loss

    state = opt.init(params)
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, V, (B, T)).astype(np.int32))
    tgts = jnp.asarray(rng.integers(0, V, (B, T)).astype(np.int32))

    t0 = time.time()
    params, state, loss = train_step(params, state, toks, tgts)
    print(f"# compile+first: {time.time()-t0:.0f}s, loss {float(loss):.3f}",
          file=sys.stderr)
    best = None
    for rep in range(3):
        nrep = 4
        t0 = time.perf_counter()
        for _ in range(nrep):
            params, state, loss = train_step(params, state, toks, tgts)
        _ = float(loss)
        dt = (time.perf_counter() - t0) / nrep
        print(f"# rep{rep}: {dt*1e3:.1f} ms/step", file=sys.stderr)
        best = dt if best is None else min(best, dt)
    tps = B * T / best
    name = "GPT-2-small" if small else "GPT-2-117M"
    print(json.dumps({
        "metric": f"{name} bf16 train tokens/sec/chip (flash-attn fwd+bwd)",
        "value": round(tps, 0), "unit": "tok/s",
        "ms_per_step": round(best * 1e3, 1)}))


if __name__ == "__main__":
    main()
