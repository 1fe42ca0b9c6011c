#!/usr/bin/env python
"""Quality gate, TPU-kernel-path row: run the REAL fused W4A8 decode
kernels on the chip over the gate's scoring window and pin their numerics
against the CPU value-level simulation.

The CPU gate (tools/quality_gate.py) measures ggml's W4A8 math as a
value-level sim; production decode runs the fused natpair W4A8 Pallas
kernels (m=1 GEMV per step). This tool closes that loop: teacher-forced
token-by-token decode (T=1, the path the kernels actually take) over the
same held-out window, then PPL + logits-KL vs the CPU sim.

Run quality_gate.py first (it writes .jax_cache/qgate_tpu_ref.npz + the
quantized params bundle), then this on the real chip. Appends a section to
docs/QUALITY.md. Reference contract: test-quantize-fns vec_dot thresholds
(/root/reference/tests/test-quantize-fns.cpp:16-22) — here applied at
whole-model scale.
"""
from __future__ import annotations

import pickle
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ggml_imax_tpu.models import gpt2  # noqa: E402
from ggml_imax_tpu.ops.pallas_qmm import params_repack_device  # noqa: E402

CTX = 256

root = Path(__file__).resolve().parents[1]
bundle = root / ".jax_cache" / "qgate_tpu_ref.npz"
if not bundle.exists():
    sys.exit("run tools/quality_gate.py first (writes the reference bundle)")
ref = np.load(bundle)
params = pickle.loads(bundle.with_suffix(".params.pkl").read_bytes())
heldout = ref["heldout"]
sim_logits = ref["sim_logits"]                     # (CTX, V) CPU W4A8 sim

if "cfg" in ref:
    _v, _c, _e, _h, _l = (int(x) for x in ref["cfg"])
    cfg = gpt2.GPT2Config(n_vocab=_v, n_ctx=_c, n_embd=_e, n_head=_h,
                          n_layer=_l)
    CTX = _c
else:  # pre-r04 bundle (small geometry, no cfg record)
    cfg = gpt2.GPT2Config(n_vocab=64, n_ctx=CTX, n_embd=128, n_head=4,
                          n_layer=2)

t0 = time.time()
params = params_repack_device(params)              # natpair W4A8 layouts
params = jax.device_put(params)
jax.block_until_ready(params)
print(f"# staged in {time.time()-t0:.0f}s on {jax.devices()[0].platform}",
      file=sys.stderr)

toks = jnp.asarray(heldout[:CTX].astype(np.int32))


@partial(jax.jit, donate_argnums=(2,))
def decode_window(params, toks, cache):
    """Teacher-forced T=1 decode over the window — every quantized matmul
    is an m=1 GEMV, i.e. the fused W4A8 kernel path production decode
    takes."""
    def step(cache, i):
        logits, cache = gpt2.forward(cfg, params, toks[i][None, None],
                                     jnp.full((1, 1), i, jnp.int32), cache, i)
        return cache, logits[0, 0]
    cache, logits = jax.lax.scan(step, cache, jnp.arange(CTX))
    return logits


cache = gpt2.init_cache(cfg, batch=1, n_ctx=CTX, dtype=jnp.bfloat16)
t0 = time.time()
logits = np.asarray(decode_window(params, toks, cache))
print(f"# {CTX}-step decode in {time.time()-t0:.0f}s", file=sys.stderr)

# teacher-forced PPL over the window (positions 0..CTX-2 predict 1..CTX-1)
lp = jax.nn.log_softmax(jnp.asarray(logits[:-1], jnp.float32), -1)
nll = -np.asarray(jnp.take_along_axis(
    lp, jnp.asarray(heldout[1:CTX].astype(np.int32))[:, None], -1))
ppl = float(np.exp(nll.mean()))

# KL(CPU-sim || TPU-kernel) per position
sp = jax.nn.log_softmax(jnp.asarray(sim_logits, jnp.float32), -1)
tp = jax.nn.log_softmax(jnp.asarray(logits, jnp.float32), -1)
kl = float(jnp.mean(jnp.sum(jnp.exp(sp) * (sp - tp), -1)))
ppl_bf16 = float(ref["ppl_bf16"])

verdict = "PASS" if kl < 5e-3 else "FAIL"
section = (
    "\n## TPU kernel-path row (tools/quality_tpu_row.py, real chip)\n\n"
    "Teacher-forced T=1 decode over the same scoring window through the "
    "production fused natpair W4A8 Pallas kernels (m=1 GEMV per step — the "
    "actual decode dispatch), vs the CPU value-level W4A8 sim:\n\n"
    "| configuration | PPL (window) | mean KL vs CPU W4A8 sim |\n"
    "|---|---|---|\n"
    f"| Q4_0 (TPU fused W4A8 kernels) | {ppl:.4f} | {kl:.2e} |\n\n"
    f"- kernel-vs-sim KL {kl:.2e} < 5e-3 -> **{verdict}** (the Pallas "
    "integer-dot path realizes the same numerics class as the value-level "
    "simulation; residual difference is bf16 KV + f32 reassociation)\n"
    f"- window PPL {ppl:.4f} vs bf16-baseline full-corpus PPL "
    f"{ppl_bf16:.4f} (different estimator supports, shown for scale)\n")

qmd = root / "docs" / "QUALITY.md"
txt = qmd.read_text()
marker = "\n## TPU kernel-path row"
if marker in txt:
    txt = txt[:txt.index(marker)]
qmd.write_text(txt + section)
print(section)
print(f"updated {qmd}")
