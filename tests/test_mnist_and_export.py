"""MNIST example + graph export/import deployment flow.

Mirrors the reference's ci e2e (ci/run.sh:124-127): train, evaluate, export
the computation graph, re-import it model-code-free, and check parity.
Data is synthetic (class-dependent Gaussian blobs) — no network egress.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from ggml_imax_tpu.models import mnist
from ggml_imax_tpu.optimize import OptResult


def synthetic_digits(rng, n=512, n_classes=10):
    """Linearly separable surrogate for MNIST: one template blob per class."""
    templates = rng.standard_normal((n_classes, 784)).astype(np.float32)
    labels = rng.integers(0, n_classes, n)
    images = templates[labels] + 0.3 * rng.standard_normal((n, 784)).astype(np.float32)
    return images.astype(np.float32), labels


def test_fc_train_eval_export_roundtrip(rng, tmp_path):
    images, labels = synthetic_digits(rng)
    params = mnist.init_fc_params(rng)
    res, params = mnist.train(mnist.fc_forward, params, images, labels,
                              n_iter=150, lr=5e-3)
    assert res in (OptResult.OK, OptResult.DID_NOT_CONVERGE)
    acc = mnist.accuracy(mnist.fc_forward, params, images, labels)
    assert acc > 0.95, acc

    # deployment artifact: export, reload without model code, compare logits
    path = tmp_path / "mnist.gitg"
    x = jnp.asarray(images[:8])
    mnist.export_model(mnist.fc_forward, params, x, path)
    run = mnist.load_model(path)
    ref = np.asarray(mnist.fc_forward(params, x))
    got = np.asarray(run(x))
    np.testing.assert_allclose(ref, got, rtol=1e-5, atol=1e-5)


def test_cnn_shapes_and_train_step(rng):
    n, n_classes = 96, 4
    templates = rng.standard_normal((n_classes, 1, 28, 28)).astype(np.float32)
    labels = rng.integers(0, n_classes, n)
    images = (templates[labels]
              + 0.2 * rng.standard_normal((n, 1, 28, 28))).astype(np.float32)
    params = mnist.init_cnn_params(rng, n_classes=n_classes)
    logits = mnist.cnn_forward(params, jnp.asarray(images[:4]))
    assert logits.shape == (4, n_classes)
    res, params = mnist.train(mnist.cnn_forward, params, images, labels,
                              n_iter=60, lr=1e-2)
    acc = mnist.accuracy(mnist.cnn_forward, params, images, labels)
    assert acc > 0.9, acc


def test_graph_export_rejects_foreign_file(tmp_path):
    p = tmp_path / "bogus.bin"
    p.write_bytes(b"NOPE" + b"\0" * 16)
    from ggml_imax_tpu.io.graph_export import load_graph
    with pytest.raises(ValueError, match="magic"):
        load_graph(p)


def test_export_stacked_decode_step(tmp_path):
    """ggml_graph_export parity beyond MNIST: the full stacked GPT-J decode
    step (scan-over-layers + interpret-mode fused kernels + donated flat
    KV arena) round-trips through the StableHLO artifact and reproduces
    logits without the model code."""
    import importlib
    import numpy as np
    import jax.numpy as jnp
    from ggml_imax_tpu.io.graph_export import export_graph, load_graph
    from ggml_imax_tpu.models import gptj
    from ggml_imax_tpu.ops.pallas_qmm import params_repack_device
    from ggml_imax_tpu.quant.formats import GGMLType
    qmm = importlib.import_module("ggml_imax_tpu.ops.qmatmul")

    cfg = gptj.GPTJConfig(n_vocab=640, n_ctx=32, n_embd=256, n_head=2,
                          n_layer=2, n_rot=32)
    params = gptj.synthetic_params(cfg, GGMLType.Q4_0, seed=31)
    import os
    os.environ["GGML_FUSE_FF"] = "1"
    params = gptj.stack_model(params_repack_device(
        gptj.fuse_out(gptj.prepare_fused(params))))
    cache = gptj.init_cache(cfg, batch=1, n_ctx=32, flat=True)
    tok = jnp.asarray([[5]], jnp.int32)
    pos = jnp.zeros((1, 1), jnp.int32)

    def step(params, tok, pos, cache):
        return gptj.forward(cfg, params, tok, pos, cache, 0)

    qmm.set_force_fused(True)
    try:
        want, _ = step(params, tok, pos, cache)
        p = tmp_path / "gptj-step.gitg"
        export_graph(step, (params, tok, pos, cache), p)
        fn = load_graph(p)
        got, _ = fn(params, tok, pos, cache)
    finally:
        qmm.set_force_fused(False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
