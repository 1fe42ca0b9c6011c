#!/usr/bin/env python
"""MNIST example — train, evaluate, export the graph, re-import it
model-code-free (/root/reference/examples/mnist: main.cpp:215 ->
main-cpu.cpp:42 deployment flow). Runs on synthetic data when no dataset
path is given (zero network egress)."""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser(description="MNIST FC/CNN train + deploy demo")
    p.add_argument("--arch", choices=("fc", "cnn"), default="fc")
    p.add_argument("--data", help="npz with images (N,784|1,28,28), labels")
    p.add_argument("--out", default="mnist.gitg", help="exported graph path")
    p.add_argument("--iters", type=int, default=200)
    args = p.parse_args()

    import jax.numpy as jnp
    from ggml_imax_tpu.models import mnist

    rng = np.random.default_rng(0)
    if args.data:
        d = np.load(args.data)
        images, labels = d["images"].astype(np.float32), d["labels"]
    else:
        templates = rng.standard_normal((10, 784)).astype(np.float32)
        labels = rng.integers(0, 10, 2048)
        images = templates[labels] + 0.3 * rng.standard_normal((2048, 784)).astype(np.float32)

    if args.arch == "fc":
        fwd, params = mnist.fc_forward, mnist.init_fc_params(rng)
        x = images
    else:
        fwd, params = mnist.cnn_forward, mnist.init_cnn_params(rng)
        x = images.reshape(-1, 1, 28, 28)

    res, params = mnist.train(fwd, params, x, labels, n_iter=args.iters)
    acc = mnist.accuracy(fwd, params, x, labels)
    print(f"train: {res.name}, accuracy {acc:.3f}")

    mnist.export_model(fwd, params, jnp.asarray(x[:1]), args.out)
    run = mnist.load_model(args.out)             # no model code needed
    pred = int(np.argmax(np.asarray(run(jnp.asarray(x[:1])))))
    print(f"exported to {args.out}; re-imported prediction for sample 0: "
          f"{pred} (label {labels[0]})")


if __name__ == "__main__":
    main()
