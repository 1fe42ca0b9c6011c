#!/usr/bin/env python
"""Layout-migration decision bench: natpair vs rowpair production layouts.

Natpair (byte row i = elements 2i, 2i+1, natural order) lets the W4A8
decode kernel slice contiguous 32-row blocks (819-1349 GB/s measured) but
makes the W4A16 scale expansion an element-repeat (jnp.repeat / 3D
broadcast) instead of a tile-repeat. This measures the prefill-side cost of
that expansion at m=512 (where it amortizes over the m rows) against the
current rowpair kernel, plus the decode-side W4A8 win at m=1.

Usage: python tools/bench_natpair.py [-r REPS] [-f FILTER]
"""
import argparse
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K, N = 4096, 16384
GEMV_BYTES = K * N // 2 + K // 32 * N * 4


def make_data(seed=0):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 16, size=(K, N), dtype=np.uint8)
    scale = (rng.standard_normal((K // 32, N)) * 0.01).astype(np.float32)
    return vals, scale


def pack_natpair(vals):
    v = vals ^ 8
    return v[0::2] | (v[1::2] << 4)


# ---- natpair W4A16 full-tile kernel (prefill) ----
def _kern_np16(expand, x_ref, qs_ref, s_ref, o_ref, acc_ref):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = pltpu.bitcast(qs_ref[:], jnp.int4).astype(jnp.int8).astype(jnp.bfloat16)
    if expand == "repeat":
        w = w * jnp.repeat(s_ref[:].astype(jnp.bfloat16), 32, axis=0)
    else:
        bk, bn = w.shape
        nb = bk // 32
        w = (w.reshape(nb, 32, bn)
             * s_ref[:].astype(jnp.bfloat16)[:, None, :]).reshape(bk, bn)
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def run_np16(expand, qs, scale, x2, bk, bn, bm):
    m = x2.shape[0]
    nb = bk // 32
    return pl.pallas_call(
        partial(_kern_np16, expand),
        grid=(m // bm, N // bn, K // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda mm, nn, kk: (mm, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda mm, nn, kk: (kk, nn),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, bn), lambda mm, nn, kk: (kk, nn),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda mm, nn, kk: (mm, nn),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * K * N,
            bytes_accessed=(m // bm) * (K * N // 2 + K // 32 * N * 4)
            + m * K * 2 + m * N * 4,
            transcendentals=0),
    )(x2.astype(jnp.bfloat16), qs, scale)


# ---- natpair W4A8 decode kernel (production-shaped grid) ----
def _kern_np8(nb, x8_ref, qs_ref, s_ref, dx_ref, o_ref, acc_ref):
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w8 = pltpu.bitcast(qs_ref[:], jnp.int4).astype(jnp.int8)
    acc = acc_ref[:]
    for b in range(nb):
        z = jax.lax.dot_general(x8_ref[b], w8[32 * b:32 * (b + 1), :],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        acc = acc + z.astype(jnp.float32) * \
            (dx_ref[b][:, None] * s_ref[b][None, :])
    acc_ref[:] = acc

    @pl.when(kk == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def run_np8(qs, scale, x8t, dxt, bk, bn, m):
    nb = bk // 32
    return pl.pallas_call(
        partial(_kern_np8, nb),
        grid=(N // bn, K // bk),
        in_specs=[
            pl.BlockSpec((nb, m, 32), lambda nn, kk: (kk, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda nn, kk: (kk, nn),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, bn), lambda nn, kk: (kk, nn),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, m), lambda nn, kk: (kk, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda nn, kk: (0, nn),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * K * N,
            bytes_accessed=K * N // 2 + K // 32 * N * 4 + m * K + m * N * 4,
            transcendentals=0),
    )(x8t, qs, scale, dxt)


def timeit_chain(fn, reps):
    def chain(r):
        @jax.jit
        def f(seed):
            s = seed
            for _ in range(r):
                out = fn(s)
                s = out[0, 0] * jnp.float32(1e-30)
            return s
        return f

    f1, f4 = chain(reps), chain(4 * reps)
    s0 = jnp.float32(0.0)
    _ = float(f1(s0)); _ = float(f4(s0))

    def run(f):
        t0 = time.perf_counter()
        _ = float(f(s0))
        return time.perf_counter() - t0
    t1 = min(run(f1) for _ in range(3))
    t4 = min(run(f4) for _ in range(3))
    return max(1e-9, (t4 - t1) / (3 * reps))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-r", "--reps", type=int, default=8)
    ap.add_argument("-f", "--filter", default="")
    args = ap.parse_args()

    vals, scale_np = make_data()
    qs_nat = jnp.asarray(pack_natpair(vals))
    scale = jnp.asarray(scale_np)
    rng = np.random.default_rng(1)
    deq = (vals.astype(np.int8) - 8).astype(np.float32) * \
        np.repeat(scale_np, 32, axis=0)

    cases = []

    # prefill m=512
    m = 512
    x512 = (rng.standard_normal((m, K)) * 0.5).astype(np.float32)
    exp512 = x512 @ deq
    xj512 = jnp.asarray(x512)
    for expand in ("repeat", "bcast"):
        for bk, bn, bm in [(512, 1024, 512), (512, 2048, 512),
                           (2048, 2048, 512), (1024, 2048, 512)]:
            cases.append((
                f"np16-{expand} m=512 bk={bk} bn={bn}",
                (lambda expand=expand, bk=bk, bn=bn, bm=bm:
                 lambda s: run_np16(expand, qs_nat, scale, xj512 + s, bk, bn,
                                    bm))(),
                exp512, 512))

    # current production paths for comparison (m=512 and m=1)
    from ggml_imax_tpu.ops.pallas_qmm import (repack_rowpair_device,
                                              set_w4a8)
    from ggml_imax_tpu.ops.qmatmul import qmatmul
    from ggml_imax_tpu.quant.device import quantize_for_device
    from ggml_imax_tpu.quant.formats import GGMLType
    wd = (rng.standard_normal((K, N)) * 0.02).astype(np.float32)
    qt_rp = repack_rowpair_device(quantize_for_device(wd, GGMLType.Q4_0))
    set_w4a8(False)
    cases.append(("production rowpair m=512",
                  lambda s: qmatmul(xj512 + s, qt_rp, out_dtype=jnp.float32),
                  None, 512))
    x1 = x512[:1]
    xj1 = jnp.asarray(x1)
    cases.append(("production rowpair m=1",
                  lambda s: qmatmul(xj1 + s, qt_rp, out_dtype=jnp.float32),
                  None, 1))

    # dense bf16 m=512 baseline
    wj = jnp.asarray(deq.astype(np.float32)).astype(jnp.bfloat16)
    cases.append(("dense bf16 m=512",
                  lambda s: jnp.matmul((xj512 + s).astype(jnp.bfloat16), wj,
                                       preferred_element_type=jnp.float32),
                  exp512, 512))

    # decode m=1 w4a8 natpair
    def q8(x):
        xr = x.reshape(x.shape[0], K // 32, 32)
        amax = np.abs(xr).max(-1)
        d = amax / 127.0
        x8 = np.round(xr / np.where(d > 0, d, 1)[..., None]).astype(np.int8)
        return np.where(d[..., None] > 0, x8, 0), d.astype(np.float32)
    x8_np, dx_np = q8(x1)
    exp8 = np.zeros((1, N), np.float32)
    for b in range(K // 32):
        z = x8_np[:, b].astype(np.int32) @ (vals[32*b:32*(b+1)].astype(np.int32) - 8)
        exp8 += z * (dx_np[:, b:b+1] * scale_np[b][None, :])
    x8t = jnp.asarray(x8_np.transpose(1, 0, 2))
    dxt = jnp.asarray(dx_np.T)
    for bk, bn in [(512, 2048), (2048, 2048), (2048, 1024)]:
        cases.append((f"np8 m=1 bk={bk} bn={bn}",
                      (lambda bk=bk, bn=bn:
                       lambda s: run_np8(qs_nat, scale,
                                         x8t + s.astype(jnp.int8), dxt,
                                         bk, bn, 1))(),
                      exp8, 1))

    print(f"# device: {jax.devices()[0].platform}")
    for name, fn, exp, m_case in cases:
        if args.filter and args.filter not in name:
            continue
        try:
            if exp is not None:
                got = np.asarray(fn(jnp.float32(0.0)))[:exp.shape[0]]
                err = np.abs(got - exp).max() / (np.abs(exp).max() + 1e-9)
                ok = "OK " if err < 2e-2 else f"ERR({err:.2e})"
            else:
                ok = "-- "
            dt = timeit_chain(fn, args.reps)
            gbs = GEMV_BYTES / dt / 1e9
            gflops = 2 * m_case * K * N / dt / 1e9
            print(f"{name:<36} {ok} {dt*1e6:9.1f} us  {gbs:7.1f} GB/s  "
                  f"{gflops/1000:6.2f} TFLOP/s", flush=True)
        except Exception as e:
            print(f"{name:<36} FAIL {type(e).__name__}: {str(e)[:140]}",
                  flush=True)


if __name__ == "__main__":
    main()
