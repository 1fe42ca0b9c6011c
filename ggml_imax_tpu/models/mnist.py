"""MNIST example family — FC net + CNN + graph-export deployment.

Reference: examples/mnist in /root/reference —
- main.cpp: 784 -> n_hidden(500) FC + relu -> 10 FC + softmax (graph at
  main.cpp:193-207), exports the *computation graph* at main.cpp:215 so
  main-cpu.cpp:42 / main-mtl.cpp:38 can run it with no model code.
- main-cnn.cpp:66-84: conv2d 3x3 + relu + maxpool2 (x2) -> dense -> softmax.
- training analog: tests/test-opt.cpp style via ggml_opt (SURVEY.md §3.4).

TPU-native: forwards are pure functions; training is optimize.opt
(jax.grad + optax); deployment is io.graph_export (StableHLO artifact).
"""
from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..io.graph_export import export_graph, load_graph
from ..ops.conv import conv_2d, pool_2d
from ..ops.tensor_ops import cross_entropy_loss
from ..optimize import AdamParams, OptResult, default_params, opt


def init_fc_params(rng: np.random.Generator, n_input=784, n_hidden=500,
                   n_classes=10, scale=0.05):
    return {
        "fc1_w": jnp.asarray(rng.standard_normal((n_input, n_hidden)).astype(np.float32) * scale),
        "fc1_b": jnp.zeros(n_hidden, jnp.float32),
        "fc2_w": jnp.asarray(rng.standard_normal((n_hidden, n_classes)).astype(np.float32) * scale),
        "fc2_b": jnp.zeros(n_classes, jnp.float32),
    }


def fc_forward(params, x):
    """x: (B, 784) -> logits (B, 10). Graph of mnist/main.cpp:193-207."""
    h = jax.nn.relu(x @ params["fc1_w"] + params["fc1_b"])
    return h @ params["fc2_w"] + params["fc2_b"]


def init_cnn_params(rng: np.random.Generator, n_classes=10, scale=0.1):
    return {
        "k1": jnp.asarray(rng.standard_normal((8, 1, 3, 3)).astype(np.float32) * scale),
        "b1": jnp.zeros((1, 8, 1, 1), jnp.float32),
        "k2": jnp.asarray(rng.standard_normal((16, 8, 3, 3)).astype(np.float32) * scale),
        "b2": jnp.zeros((1, 16, 1, 1), jnp.float32),
        "dense_w": jnp.asarray(rng.standard_normal((16 * 5 * 5, n_classes)).astype(np.float32) * scale),
        "dense_b": jnp.zeros(n_classes, jnp.float32),
    }


def cnn_forward(params, x):
    """x: (B, 1, 28, 28) -> logits (B, 10). Graph of main-cnn.cpp:66-84:
    [conv3x3 + relu + maxpool2] x2, flatten, dense."""
    h = jax.nn.relu(conv_2d(x, params["k1"]) + params["b1"])       # (B,8,26,26)
    h = pool_2d(h, "max", 2, 2, 2, 2)                              # (B,8,13,13)
    h = jax.nn.relu(conv_2d(h, params["k2"]) + params["b2"])       # (B,16,11,11)
    h = pool_2d(h, "max", 2, 2, 2, 2)                              # (B,16,5,5)
    h = h.reshape(h.shape[0], -1)
    return h @ params["dense_w"] + params["dense_b"]


def train(forward, params, images, labels, *, n_iter=300, lr=1e-2):
    """test-opt.cpp analog: minimize cross-entropy with ADAM. labels are
    int class ids. Returns (result, params)."""
    images = jnp.asarray(images)
    onehot = jnp.asarray(np.eye(int(labels.max()) + 1,
                                dtype=np.float32)[np.asarray(labels)])
    # full-batch loss keeps the jitted step shape-stable and matches
    # ggml_opt's deterministic f; example-scale data fits easily
    def loss_full(p):
        return cross_entropy_loss(forward(p, images), onehot)[0]

    po = default_params("adam")
    po.adam = AdamParams(n_iter=n_iter, alpha=lr, eps_f=1e-7, eps_g=1e-4)
    po.max_no_improvement = 50
    res, params, _ = opt(loss_full, params, po)
    return res, params


def accuracy(forward, params, images, labels) -> float:
    pred = np.asarray(jnp.argmax(forward(params, jnp.asarray(images)), -1))
    return float((pred == np.asarray(labels)).mean())


def export_model(forward, params, example_x, path: str | Path):
    """mnist/main.cpp:215 analog: freeze params into the graph and export
    the input->logits computation as a deployable artifact."""
    export_graph(lambda x: forward(params, x), (example_x,), path)


def load_model(path: str | Path):
    """main-cpu.cpp:42 analog: re-import and run without model code."""
    return load_graph(path)
