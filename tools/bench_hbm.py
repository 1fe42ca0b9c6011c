#!/usr/bin/env python
"""HBM-honest kernel timing: alternate NW distinct weight buffers in the
timing chain so the combined working set (NW x 42 MB) exceeds VMEM and every
call streams its weights from HBM — the regime a real multi-GB model decode
lives in. (Single-buffer chained timing lets XLA keep the 42 MB GEMV working
set VMEM-resident and reports VMEM bandwidth: up to 8 TB/s was observed.)

Compares, at the GPT-J decode GEMV (m=1, K=4096, N=16384):
  natpair-w4a8   per-block int8 MXU dots (production q4_layout=3 decode path)
  rowpair-w4a16  the previous production kernel (q4_layout=1)
  dense-bf16     jnp.matmul on a dense bf16 mirror (2x the bytes)

Usage: python tools/bench_hbm.py [-r REPS] [-w NW]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K, N = 4096, 16384
GEMV_BYTES = K * N // 2 + K // 32 * N * 4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-r", "--reps", type=int, default=8)
    ap.add_argument("-w", "--n-weights", type=int, default=4)
    ap.add_argument("--sweep", action="store_true",
                    help="tile + scale-dtype sweep of the W4A8 path")
    args = ap.parse_args()
    NW = args.n_weights

    from ggml_imax_tpu.ops.pallas_qmm import (repack_natpair_device,
                                              repack_rowpair_device,
                                              qmatmul_pallas, set_w4a8)
    from ggml_imax_tpu.quant.device import quantize_for_device

    from ggml_imax_tpu.quant.formats import GGMLType
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.standard_normal((1, K)) * 0.5).astype(np.float32))

    def stage(repack):
        outs = []
        for i in range(NW):
            w = (rng.standard_normal((K, N)) * 0.02).astype(np.float32)
            outs.append(repack(quantize_for_device(w, GGMLType.Q4_0)))
        jax.block_until_ready(jax.tree.leaves(outs[0]))
        return outs

    def timeit(fn, reps):
        def chain(r):
            @jax.jit
            def f(seed):
                s = seed
                for i in range(r):
                    out = fn(i % NW, s)
                    s = out[0, 0] * jnp.float32(1e-30)
                return s
            return f
        f1, f4 = chain(reps * NW), chain(4 * reps * NW)
        s0 = jnp.float32(0.0)
        _ = float(f1(s0)); _ = float(f4(s0))

        def run(f):
            t0 = time.perf_counter()
            _ = float(f(s0))
            return time.perf_counter() - t0
        t1 = min(run(f1) for _ in range(3))
        t4 = min(run(f4) for _ in range(3))
        return max(1e-9, (t4 - t1) / (3 * reps * NW))

    print(f"# device: {jax.devices()[0].platform}, {NW} weight buffers = "
          f"{NW * GEMV_BYTES / 1e6:.0f} MB working set")

    if "--sweep" in sys.argv:
        # tile + scale-dtype sweep on the W4A8 path
        from dataclasses import replace as _rp
        from ggml_imax_tpu.ops.pallas_qmm import set_w4a8_tiles
        qts = stage(repack_natpair_device)
        qts16 = [_rp(q, scale=q.scale.astype(jnp.float16)) for q in qts]
        jax.block_until_ready(qts16[0].scale)
        for sdt, qq in (("f32", qts), ("f16", qts16)):
            nb = GEMV_BYTES if sdt == "f32" else K * N // 2 + K // 32 * N * 2
            for bkk, bn in [(2048, 1024), (2048, 2048), (2048, 4096)]:
                set_w4a8_tiles(bkk, bn)
                try:
                    dt = timeit(lambda i, s: qmatmul_pallas(x + s, qq[i]),
                                args.reps)
                    print(f"w4a8 s={sdt} bkk={bkk} bn={bn}   {dt*1e6:9.1f} us"
                          f"  {nb/dt/1e9:7.1f} GB/s eff", flush=True)
                except Exception as e:
                    print(f"w4a8 s={sdt} bkk={bkk} bn={bn}   FAIL "
                          f"{str(e)[:90]}", flush=True)
        set_w4a8_tiles(2048, 2048)
        return

    # natpair W4A8 (production decode path)
    qts = stage(repack_natpair_device)
    set_w4a8(True)
    dt = timeit(lambda i, s: qmatmul_pallas(x + s, qts[i]), args.reps)
    print(f"natpair-w4a8   {dt*1e6:9.1f} us  {GEMV_BYTES/dt/1e9:7.1f} GB/s eff",
          flush=True)

    # natpair W4A16 (same layout, set_w4a8 off)
    set_w4a8(False)
    dt = timeit(lambda i, s: qmatmul_pallas(x + s, qts[i]), args.reps)
    set_w4a8(True)
    print(f"natpair-w4a16  {dt*1e6:9.1f} us  {GEMV_BYTES/dt/1e9:7.1f} GB/s eff",
          flush=True)
    del qts

    # rowpair W4A16 (previous production)
    qts = stage(repack_rowpair_device)
    dt = timeit(lambda i, s: qmatmul_pallas(x + s, qts[i]), args.reps)
    print(f"rowpair-w4a16  {dt*1e6:9.1f} us  {GEMV_BYTES/dt/1e9:7.1f} GB/s eff",
          flush=True)
    del qts

    # dense bf16 mirror (2x weight bytes)
    ws = [jnp.asarray((rng.standard_normal((K, N)) * 0.02).astype(np.float32)
                      ).astype(jnp.bfloat16) for _ in range(NW)]
    jax.block_until_ready(ws)
    dt = timeit(lambda i, s: jnp.matmul((x + s).astype(jnp.bfloat16), ws[i],
                                        preferred_element_type=jnp.float32),
                args.reps)
    print(f"dense-bf16     {dt*1e6:9.1f} us  {2*K*N/dt/1e9:7.1f} GB/s eff "
          "(of its own 2x bytes)", flush=True)


if __name__ == "__main__":
    main()
