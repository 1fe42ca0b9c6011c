"""Example-CLI e2e tests — the reference's ci/run.sh fixed-seed model runs
(:90-94): build a tiny legacy .bin, drive the CLI in a subprocess, check it
generates deterministically.
"""
import struct
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from ggml_imax_tpu.io.legacy_bin import read_legacy_bin, write_legacy_bin
from ggml_imax_tpu.quant import codecs
from ggml_imax_tpu.quant.formats import GGMLType

REPO = Path(__file__).resolve().parents[1]


def build_tiny_gpt2_bin(path, rng, n_vocab=64, n_ctx=32, n_embd=32,
                        n_head=2, n_layer=1, wtype=GGMLType.Q4_0):
    hp = dict(n_vocab=n_vocab, n_ctx=n_ctx, n_embd=n_embd, n_head=n_head,
              n_layer=n_layer, ftype=int(wtype))
    # vocab covering the GPT-2 split-regex pieces of the test prompt
    base = ["tok", " tok"] + [str(d) for d in range(10)] \
        + [chr(c) for c in range(ord("a"), ord("z") + 1)] + [" "]
    vocab = [t.encode() for t in (base + [f"<x{i}>" for i in range(n_vocab)])[:n_vocab]]

    def enc(shape_ne, t=wtype):
        # shape_ne: ggml ne order (row len first); data rows = prod(ne[1:])
        rows = int(np.prod(shape_ne[1:])) if len(shape_ne) > 1 else 1
        x = (rng.standard_normal((rows, shape_ne[0])) * 0.1).astype(np.float32)
        return (t, tuple(shape_ne), codecs.quantize(x, t))

    def encf(shape_ne):
        return enc(shape_ne, GGMLType.F32)

    E, V, C = n_embd, n_vocab, n_ctx
    tensors = {
        "model/wte": enc((E, V)),
        "model/wpe": encf((E, C)),
        "model/ln_f/g": encf((E,)), "model/ln_f/b": encf((E,)),
    }
    for i in range(n_layer):
        p = f"model/h{i}"
        tensors.update({
            f"{p}/ln_1/g": encf((E,)), f"{p}/ln_1/b": encf((E,)),
            f"{p}/ln_2/g": encf((E,)), f"{p}/ln_2/b": encf((E,)),
            f"{p}/attn/c_attn/w": enc((E, 3 * E)),
            f"{p}/attn/c_attn/b": encf((3 * E,)),
            f"{p}/attn/c_proj/w": enc((E, E)),
            f"{p}/attn/c_proj/b": encf((E,)),
            f"{p}/mlp/c_fc/w": enc((E, 4 * E)),
            f"{p}/mlp/c_fc/b": encf((4 * E,)),
            f"{p}/mlp/c_proj/w": enc((4 * E, E)),
            f"{p}/mlp/c_proj/b": encf((E,)),
        })
    write_legacy_bin(path, hp, ["n_vocab", "n_ctx", "n_embd", "n_head",
                                "n_layer", "ftype"], vocab, tensors)


def test_legacy_bin_writer_roundtrip(tmp_path, rng):
    p = tmp_path / "tiny.bin"
    build_tiny_gpt2_bin(p, rng)
    f = read_legacy_bin(p, ["n_vocab", "n_ctx", "n_embd", "n_head",
                            "n_layer", "ftype"])
    assert f.hparams["n_vocab"] == 64 and len(f.vocab) == 64
    assert f.tensors["model/wte"].ggml_type == GGMLType.Q4_0
    assert f.tensors["model/wpe"].shape == (32, 32)


def _run_cli(script, argv, timeout=240):
    """Run an example CLI in a CPU-platform subprocess (the sandbox
    sitecustomize registers the TPU plugin, so force cpu via config)."""
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        f"import sys, runpy; sys.argv = {[str(script)] + argv!r};"
        f"runpy.run_path({str(script)!r}, run_name='__main__')"
    )
    return subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=timeout, cwd=REPO)


def test_gpt2_cli_generates(tmp_path, rng):
    model = tmp_path / "tiny-gpt2.bin"
    build_tiny_gpt2_bin(model, rng)
    r = _run_cli(REPO / "examples/gpt2.py",
                 ["-m", str(model), "-p", "tok1 tok2", "-n", "4",
                  "-s", "1234", "--f32"])
    assert r.returncode == 0, r.stderr[-2000:]
    out = r.stdout.strip()
    assert out.startswith("tok1 tok2")
    assert len(out) > len("tok1 tok2")           # generated something
    # fixed seed -> deterministic (ci/run.sh -s 1234 golden-run style)
    r2 = _run_cli(REPO / "examples/gpt2.py",
                  ["-m", str(model), "-p", "tok1 tok2", "-n", "4",
                   "-s", "1234", "--f32"])
    assert r2.stdout == r.stdout


def test_quantize_cli(tmp_path, rng):
    from ggml_imax_tpu.io.gguf import GGUFWriter, GGUFReader
    src, dst = tmp_path / "m.gguf", tmp_path / "m-q.gguf"
    w = GGUFWriter(src)
    x = (rng.standard_normal((4, 64)) * 0.1).astype(np.float32)
    w.add_tensor("a.weight", x, GGMLType.F32, shape=(64, 4))
    w.write()
    r = _run_cli(REPO / "examples/quantize.py", [str(src), str(dst), "q5_1"])
    assert r.returncode == 0, r.stderr[-2000:]
    with GGUFReader(dst) as g:
        assert g.tensors["a.weight"].ggml_type == GGMLType.Q5_1


def test_serve_bench_smoke(monkeypatch):
    """`serve.py --bench` (the serving-throughput benchmark, reference
    semantics main-batched.cpp) runs end to end in tiny CI geometry and
    prints a parseable JSON line with aggregate tok/s + p50 TTFT."""
    import json
    import os
    import subprocess
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import sys, runpy;"
        f"sys.argv = ['serve.py', '--bench', '-np', '3'];"
        f"runpy.run_path({str(REPO / 'examples/serve.py')!r},"
        " run_name='__main__')"
    )
    env = dict(os.environ, GGML_SERVE_BENCH_TINY="1")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=400, cwd=REPO, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["metric"] == "serve_gptj6b_q4_0_tok_s"
    assert rec["value"] > 0 and rec["p50_ttft_ms"] > 0
    assert rec["n_requests"] == 3 and rec["generated"] == 3 * 6

def test_serve_bench_steady_smoke():
    """`serve.py --bench --steady`: the steady-state serving bench drains
    the post-ramp decode tail through the double-buffered pipeline
    (run_pipelined) and reports steady_tok_s separately."""
    import json
    import os
    import subprocess
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import sys, runpy;"
        f"sys.argv = ['serve.py', '--bench', '-np', '3', '--steady'];"
        f"runpy.run_path({str(REPO / 'examples/serve.py')!r},"
        " run_name='__main__')"
    )
    env = dict(os.environ, GGML_SERVE_BENCH_TINY="1")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=400, cwd=REPO, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["steady_tok_s"] > 0 and rec["steady_generated"] > 0
    assert rec["generated"] == 3 * 6
