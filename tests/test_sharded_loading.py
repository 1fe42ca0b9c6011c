"""Shard-aware GGUF loading (SURVEY hard part (e)): each shard decodes only
its byte ranges; the assembled global arrays equal a full decode."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ggml_imax_tpu.io.gguf import GGUFReader, GGUFWriter
from ggml_imax_tpu.io.sharded import load_qtensor_sharded
from ggml_imax_tpu.quant import codecs
from ggml_imax_tpu.quant.device import dequantize_qtensor, to_device_format
from ggml_imax_tpu.quant.formats import GGMLType


@pytest.mark.parametrize("t", [GGMLType.Q4_0, GGMLType.Q8_0, GGMLType.Q4_K,
                               GGMLType.F32, GGMLType.IQ3_S,
                               GGMLType.IQ2_S])
def test_sharded_load_matches_full(tmp_path, rng, t):
    k, n = 256, 32
    x = rng.standard_normal((n, k)).astype(np.float32)   # ggml rows along N
    from ggml_imax_tpu.quant.imatrix import quantize_rows
    raw = quantize_rows(x, t)       # routes IQ codebook formats natively
    p = tmp_path / "w.gguf"
    w = GGUFWriter(p)
    w.add_tensor("w", raw, t, shape=(k, n))
    w.write()

    mesh = Mesh(np.array(jax.devices()[:4]), ("tp",))
    with GGUFReader(p) as r:
        qt = load_qtensor_sharded(r, "w", mesh)
        full = to_device_format(r.tensor_data("w"), t, (k, n))
        # component arrays equal the full decode
        np.testing.assert_array_equal(np.asarray(qt.q), np.asarray(full.q))
        if full.scale is not None:
            np.testing.assert_array_equal(np.asarray(qt.scale),
                                          np.asarray(full.scale))
        # codebook kinds: LUT carried, sign bitplane sharded like q
        if full.signs is not None:
            np.testing.assert_array_equal(np.asarray(qt.signs),
                                          np.asarray(full.signs))
        if full.lut is not None:
            np.testing.assert_array_equal(np.asarray(qt.lut),
                                          np.asarray(full.lut))
        # sharding actually applied along N
        assert len(qt.q.sharding.device_set) == 4
        np.testing.assert_allclose(dequantize_qtensor(qt),
                                   dequantize_qtensor(full), rtol=1e-6)
