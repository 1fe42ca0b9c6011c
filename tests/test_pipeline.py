"""Pipeline-parallel tests on the virtual 8-device CPU mesh (SURVEY §2.10
PP row; replaces the scheduler's micro-batch pipelining)."""
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
