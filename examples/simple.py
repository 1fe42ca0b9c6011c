#!/usr/bin/env python
"""Minimal end-to-end demo — the examples/simple analog (/root/reference/
examples/simple): quantize a matrix, run a fused quantized matmul, compare
against the f32 product."""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax.numpy as jnp
    from ggml_imax_tpu.ops.qmatmul import qmatmul
    from ggml_imax_tpu.quant.device import quantize_for_device
    from ggml_imax_tpu.quant.formats import GGMLType

    rng = np.random.default_rng(0)
    k, n, m = 1024, 512, 4
    w = (rng.standard_normal((k, n)) * 0.1).astype(np.float32)
    x = rng.standard_normal((m, k)).astype(np.float32)

    qt = quantize_for_device(w, GGMLType.Q4_0)     # encode + device layout
    y = np.asarray(qmatmul(jnp.asarray(x), qt, out_dtype=jnp.float32))
    ref = x @ w
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    print(f"quantized matmul ({m}x{k} @ {k}x{n}, Q4_0): "
          f"max rel err vs f32 = {rel:.4f}")
    assert rel < 0.05
    print("ok")


if __name__ == "__main__":
    main()
