"""Pipeline-parallel tests on the virtual 8-device CPU mesh (SURVEY §2.10
PP row; replaces the scheduler's micro-batch pipelining)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ggml_imax_tpu.parallel.pipeline import pipeline_forward, stack_stage_params


def make_mesh(pp):
    devs = np.array(jax.devices()[:pp])
    return Mesh(devs, ("pp",))


@pytest.mark.parametrize("pp,n_micro", [(4, 4), (4, 8), (8, 8), (2, 6)])
def test_pipeline_matches_sequential(rng, pp, n_micro):
    d = 16
    n_stages = pp
    per_stage = [{"w": jnp.asarray(rng.standard_normal((d, d)).astype(np.float32) * 0.3),
                  "b": jnp.asarray(rng.standard_normal(d).astype(np.float32))}
                 for _ in range(n_stages)]
    stacked = stack_stage_params(per_stage)

    def stage(p, x):
        return jnp.tanh(x @ p["w"] + p["b"])

    x = jnp.asarray(rng.standard_normal((n_micro * 2, d)).astype(np.float32))
    ref = x
    for p in per_stage:
        ref = stage(p, ref)

    got = pipeline_forward(stage, stacked, x, make_mesh(pp),
                           n_microbatch=n_micro)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-5, atol=1e-5)


def test_distributed_info_and_mesh():
    from ggml_imax_tpu.parallel import distributed as D
    ci = D.init()                      # single-process no-op bootstrap
    assert ci.process_count == 1 and ci.global_devices >= 8
    mesh = D.global_mesh({"dp": 2, "tp": -1})
    assert mesh.shape["dp"] == 2 and mesh.shape["tp"] >= 4


def test_profiling_timers_and_hlo(rng):
    import jax.numpy as jnp
    from ggml_imax_tpu.utils.profiling import GraphTimers, dump_hlo, memory_stats
    t = GraphTimers()
    x = jnp.asarray(rng.standard_normal((32, 32)).astype(np.float32))
    with t.section("matmul", sync=None):
        y = x @ x
    rep = t.report()
    assert "matmul" in rep and "1 runs" in rep
    hlo = dump_hlo(lambda a: a @ a, x)
    assert "fusion" in hlo or "dot" in hlo
    assert isinstance(memory_stats(), dict)


def test_log_callback():
    from ggml_imax_tpu.utils import logging as L
    seen = []
    L.set_log_callback(lambda lvl, msg: seen.append((lvl, msg)))
    try:
        L.warn("hello")
    finally:
        L.set_log_callback(None)
    assert seen == [(L.LogLevel.WARN, "hello")]


def test_distributed_two_process_psum():
    """Exercise the REAL jax.distributed.initialize branch
    (parallel/distributed.py init) across 2 OS processes on CPU — the
    analog of the reference RPC backend's client/server round trip
    (ggml-rpc.cpp:569-601, 875). Each process owns 2 CPU devices; the
    collective spans all 4."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)          # worker sets its own device count
    worker = os.path.join(os.path.dirname(__file__), "_dist_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=os.path.dirname(os.path.dirname(worker)))
        for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"PSUM_OK {pid}" in out, out
        # row sums of arange(32).reshape(4, 8): col j -> 48 + 4j
        assert "[48.0, 52.0, 56.0]" in out, out


def test_distributed_two_process_tp_decode():
    """The FULL tp=4 GPT-J decode path across a process boundary: 2 OS
    processes x 2 CPU devices, fused stacked params loaded shard-wise via
    make_array_from_callback, shard_map forward (one psum/layer + lm-head
    all-gather), prefill + 2 decode steps — logits must equal the
    single-process fused run. This walks the path the multi-host claim
    rests on end-to-end, not just a bare psum (the RPC graph_compute
    round-trip analog, ggml-rpc.cpp:875)."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)          # worker sets its own device count
    worker = os.path.join(os.path.dirname(__file__), "_dist_tp_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=os.path.dirname(os.path.dirname(worker)))
        for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    argmaxes = set()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"TP_DECODE_OK {pid}" in out, out
        for line in out.splitlines():
            if line.startswith("TP_DECODE_OK"):
                argmaxes.add(line.split("argmax=")[1])
    assert len(argmaxes) == 1, argmaxes   # both processes agree
