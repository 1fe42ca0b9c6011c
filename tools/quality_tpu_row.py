#!/usr/bin/env python
"""Quality gate, TPU-kernel-path rows: run the REAL fused decode kernels
on the chip over the gate's scoring window and pin their numerics against
the CPU value-level simulation — for every production kernel family:

  Q4_0  natpair W4A8 (the GPT-J headline path)
  Q4_K  natpair W4A8 with the affine (d·sub_scale / dmin·sub_min) bias
        term (the LLaMA-2 7B path)
  Q5_0  nat8 W8A8 (the Whisper path)

The CPU gate (tools/quality_gate.py) measures ggml's W4A8 math as a
value-level sim; production decode runs the fused Pallas kernels (m=1
GEMV per step) with bf16 scale/bias storage (the r05 default). This tool
closes that loop: teacher-forced token-by-token decode (T=1, the path the
kernels actually take) over the same held-out window, then PPL +
logits-KL vs the CPU sim.

Run quality_gate.py first (it writes .jax_cache/qgate_tpu_ref*.npz + the
quantized params bundles), then this on the real chip. Appends a section
to docs/QUALITY.md. Reference contract: test-quantize-fns vec_dot
thresholds (/root/reference/tests/test-quantize-fns.cpp:16-22) — here
applied at whole-model scale.
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

root = Path(__file__).resolve().parents[1]
KERNEL_NOTE = {
    "Q4_0": "natpair W4A8",
    "Q4_K": "natpair W4A8 + affine bias",
    "Q5_0": "nat8 W8A8",
}


def run_row(fmt: str, mid: bool = False):
    suffix = "" if fmt == "Q4_0" else f"_{fmt}"
    if mid:           # bundles from quality_gate.py --geometry mid (117M)
        suffix += "_mid"
    bundle = root / ".jax_cache" / f"qgate_tpu_ref{suffix}.npz"
    if not bundle.exists():
        print(f"# {fmt}: no bundle at {bundle} — run tools/quality_gate.py",
              file=sys.stderr)
        return None
    ref = np.load(bundle)
    params = pickle.loads(bundle.with_suffix(".params.pkl").read_bytes())
    heldout = ref["heldout"]
    sim_logits = ref["sim_logits"]                 # (CTX, V) CPU W4A8 sim

    if "cfg" in ref:
        _v, _c, _e, _h, _l = (int(x) for x in ref["cfg"])
        cfg = gpt2.GPT2Config(n_vocab=_v, n_ctx=_c, n_embd=_e, n_head=_h,
                              n_layer=_l)
    else:  # pre-r04 bundle (small geometry, no cfg record)
        cfg = gpt2.GPT2Config(n_vocab=64, n_ctx=256, n_embd=128, n_head=4,
                              n_layer=2)
    ctx = cfg.n_ctx

    t0 = time.time()
    # bf16 scale/bias storage = the production default (bench.py r05)
    params = params_repack_device(params, scale_dtype=jnp.bfloat16)
    params = jax.device_put(params)
    jax.block_until_ready(params)
    print(f"# {fmt}: staged in {time.time()-t0:.0f}s on "
          f"{jax.devices()[0].platform}", file=sys.stderr)

    toks = jnp.asarray(heldout[:ctx].astype(np.int32))

    @partial(jax.jit, donate_argnums=(2,))
    def decode_window(params, toks, cache):
        """Teacher-forced T=1 decode over the window — every quantized
        matmul is an m=1 GEMV, i.e. the fused kernel path production
        decode takes."""
        def step(cache, i):
            logits, cache = gpt2.forward(cfg, params, toks[i][None, None],
                                         jnp.full((1, 1), i, jnp.int32),
                                         cache, i)
            return cache, logits[0, 0]
        cache, logits = jax.lax.scan(step, cache, jnp.arange(ctx))
        return logits

    cache = gpt2.init_cache(cfg, batch=1, n_ctx=ctx, dtype=jnp.bfloat16)
    t0 = time.time()
    logits = np.asarray(decode_window(params, toks, cache))
    print(f"# {fmt}: {ctx}-step decode in {time.time()-t0:.0f}s",
          file=sys.stderr)

    # teacher-forced PPL over the window (positions 0..ctx-2 predict 1..)
    lp = jax.nn.log_softmax(jnp.asarray(logits[:-1], jnp.float32), -1)
    nll = -np.asarray(jnp.take_along_axis(
        lp, jnp.asarray(heldout[1:ctx].astype(np.int32))[:, None], -1))
    ppl = float(np.exp(nll.mean()))

    # KL(CPU-sim || TPU-kernel) per position
    sp = jax.nn.log_softmax(jnp.asarray(sim_logits, jnp.float32), -1)
    tp = jax.nn.log_softmax(jnp.asarray(logits, jnp.float32), -1)
    kl = float(jnp.mean(jnp.sum(jnp.exp(sp) * (sp - tp), -1)))
    ppl_bf16 = float(ref["ppl_bf16"])
    return ppl, kl, ppl_bf16


def main():
    mid = "--mid" in sys.argv
    fmts = [a for a in sys.argv[1:] if not a.startswith("--")] \
        or ["Q4_0", "Q4_K", "Q5_0"]
    rows, all_pass = [], True
    ppl_bf16 = None
    for fmt in fmts:
        r = run_row(fmt, mid=mid)
        if r is None:
            continue
        ppl, kl, ppl_bf16 = r
        verdict = "PASS" if kl < 5e-3 else "FAIL"
        all_pass &= verdict == "PASS"
        rows.append((fmt, ppl, kl, verdict))
        print(f"# {fmt}: ppl {ppl:.4f} KL {kl:.2e} {verdict}",
              file=sys.stderr)
    if not rows:
        sys.exit("no bundles found — run tools/quality_gate.py first")

    section = (
        "\n## TPU kernel-path rows (tools/quality_tpu_row.py, real chip)\n\n"
        "Teacher-forced T=1 decode over the same scoring window through "
        "the production fused Pallas kernels (m=1 GEMV per step, bf16 "
        "scale/bias storage — the shipped decode dispatch), vs the CPU "
        "value-level W4A8 sim:\n\n"
        "| format (kernel family) | PPL (window) | mean KL vs CPU sim | "
        "gate (<5e-3) |\n|---|---|---|---|\n")
    for fmt, ppl, kl, verdict in rows:
        section += (f"| {fmt} ({KERNEL_NOTE.get(fmt, '?')}) | {ppl:.4f} | "
                    f"{kl:.2e} | **{verdict}** |\n")
    section += (
        "\n- the Pallas integer-dot paths realize the same numerics class "
        "as the value-level simulation; residual difference is bf16 KV + "
        "bf16 scale storage + f32 reassociation\n"
        f"- window PPLs vs bf16-baseline full-corpus PPL {ppl_bf16:.4f} "
        "(different estimator supports, shown for scale)\n")

    qmd = root / "docs" / ("QUALITY_117M.md" if mid else "QUALITY.md")
    txt = qmd.read_text()
    for marker in ("\n## TPU kernel-path row", "\n## TPU kernel-path rows"):
        if marker in txt:
            txt = txt[:txt.index(marker)]
    qmd.write_text(txt + section)
    print(section)
    print(f"updated {qmd}")
    if not all_pass:
        sys.exit("kernel-path KL gate FAILED for at least one format")


if __name__ == "__main__":
    main()
