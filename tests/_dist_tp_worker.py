"""Worker for the 2-process TP decode equality test (test_pipeline.py).

Each of 2 OS processes owns 2 CPU devices; the tp=4 mesh spans both. The
FULL production TP decode path runs across the process boundary — fused
stacked GPT-J params loaded shard-wise via jax.make_array_from_callback
(each process materializes only its addressable shards: the multi-host
GGUF loading pattern, SURVEY.md §7 step 2), shard_map forward with one
psum per layer + tiled lm-head all-gather — and its logits must equal the
single-process fused run. The analog of the reference RPC backend's
remote graph_compute round trip (ggml-rpc.cpp:875), done as collectives.
"""
import os
import sys

# must win before sitecustomize-registered plugins pick a platform
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["GGML_FUSE_FF"] = "1"

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)   # 2 local x 2 procs = 4 global

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from ggml_imax_tpu.parallel import distributed  # noqa: E402


def _fused_stacked_params(cfg, tp):
    from ggml_imax_tpu.models import gptj
    from ggml_imax_tpu.ops.pallas_qmm import params_repack_device
    from ggml_imax_tpu.quant.formats import GGMLType
    params = gptj.synthetic_params(cfg, GGMLType.Q4_0, seed=3)
    params = gptj.fuse_qkv(params)
    params = gptj.fuse_out(params)
    params = gptj.pad_lm_head(params, multiple=128 * tp)
    params = params_repack_device(params)
    return gptj.stack_model(params)


def main() -> None:
    pid = int(sys.argv[1])
    port = sys.argv[2]
    ci = distributed.init(coordinator_address=f"localhost:{port}",
                          num_processes=2, process_id=pid)
    assert ci.process_count == 2 and ci.global_devices == 4, ci

    from ggml_imax_tpu.models import gptj
    from ggml_imax_tpu.ops.qmatmul import set_force_fused
    from ggml_imax_tpu.parallel.tp import (cache_spec, forward_tp,  # noqa: F401
                                           init_cache_tp, make_callback_put,
                                           shard_params_tp)

    TP = 4
    cfg = gptj.GPTJConfig(n_vocab=1024, n_ctx=64, n_embd=512, n_head=8,
                          n_layer=2, n_rot=32)
    mesh = distributed.global_mesh({"tp": -1})
    assert mesh.shape["tp"] == TP

    set_force_fused(True)   # interpret-mode Pallas kernels on CPU
    try:
        # single-process reference on this process's local device 0: the
        # same fused stacked params (identical by construction, seed 3)
        ref_params = _fused_stacked_params(cfg, TP)
        cache1 = gptj.init_cache(cfg, batch=1, n_ctx=64, flat=True)

        put = make_callback_put(mesh)
        tp_params, specs = shard_params_tp(_fused_stacked_params(cfg, TP),
                                           mesh, cfg, put=put)
        cache4 = init_cache_tp(cfg, mesh, batch=1, n_ctx=64, put=put)

        # replicated step inputs as explicit global arrays
        def rep(x):
            return put(np.asarray(x))

        toks = np.arange(1, 5, dtype=np.int32)[None]
        pos = np.arange(4, dtype=np.int32)[None]
        l1, cache1 = gptj.forward(cfg, ref_params, jnp.asarray(toks),
                                  jnp.asarray(pos), cache1, 0)
        l4, cache4 = forward_tp(cfg, tp_params, rep(toks), rep(pos), cache4,
                                0, mesh, specs)
        got = np.asarray(l4.addressable_data(0))
        np.testing.assert_allclose(got[0], np.asarray(l1)[0],
                                   rtol=2e-3, atol=2e-3)

        # two decode steps with growing n_past across the process boundary
        tok = np.argmax(np.asarray(l1)[:, -1:], -1).astype(np.int32)
        for step in range(2):
            p = np.full((1, 1), 4 + step, np.int32)
            l1, cache1 = gptj.forward(cfg, ref_params, jnp.asarray(tok),
                                      jnp.asarray(p), cache1, 4 + step)
            l4, cache4 = forward_tp(cfg, tp_params, rep(tok), rep(p), cache4,
                                    4 + step, mesh, specs)
            got = np.asarray(l4.addressable_data(0))
            np.testing.assert_allclose(got[0], np.asarray(l1)[0],
                                       rtol=2e-3, atol=2e-3)
            tok = np.argmax(np.asarray(l1)[:, -1:], -1).astype(np.int32)
        print(f"TP_DECODE_OK {pid} argmax={int(np.argmax(got[0, -1]))}",
              flush=True)
    finally:
        set_force_fused(False)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
