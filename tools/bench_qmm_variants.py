#!/usr/bin/env python
"""Q4 GEMV kernel-variant shootout (round-2 perf work).

Goal: close the 513 -> ~835 GB/s gap between the rowpair W4A16 kernel and the
HBM-bound int8-kind kernel. The int8 kernel proves the chip sustains ~835 GB/s
effective on this access pattern; the Q4 kernel's deficit is pure VPU cost in
the nibble-expand chain (int4->int8->bf16 cast + scale multiply).

Variants measured at the GPT-J decode shape (m=1, K=4096, N=16384):
  ceiling   stream-only kernel (reads the q tiles, touches 8 rows) = DMA bound
  rowpair   current production kernel (ops/pallas_qmm.py)
  w4a16-bd  per-block bf16 dots, scale applied per block in the epilogue
            (removes the per-element scale multiply + pltpu.repeat)
  w4a8      ggml's actual math (vec_dot_q4_0_q8_0, ggml-quants.c:3469/3855):
            activations quantized to int8 per 32-block, integer MXU dots per
            block, f32 scale-product epilogue. Removes the int8->bf16 cast
            AND the per-element multiply - weights go bitcast-only to the MXU.
  tile sweeps over (bk, bn) for the winners.

Usage: python tools/bench_qmm_variants.py [-r REPS] [-f FILTER]
"""
import argparse
import os
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

K = int(os.environ.get("GGML_QMM_K", "4096"))
N = int(os.environ.get("GGML_QMM_N", "16384"))


# ---------------------------------------------------------------- data ----
def make_data(seed=0):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 16, size=(K, N), dtype=np.uint8)  # stored nibbles
    scale = (rng.standard_normal((K // 32, N)) * 0.01).astype(np.float32)
    x = (rng.standard_normal((1, K)) * 0.5).astype(np.float32)
    return vals, scale, x


def pack_rowpair(vals, bk):
    """u-order rowpair layout (matches ops/pallas_qmm.repack_rowpair_device):
    logical elem (tile, block b, intra e) -> bitcast row u = e*NB + b.
    XOR 8: offset-binary nibble -> two's complement so the signed int4
    bitcast read equals (val - 8)."""
    nb = bk // 32
    vt = (vals ^ 8).reshape(K // bk, nb, 32, N).transpose(0, 2, 1, 3)
    vt = vt.reshape(K, N)
    return vt[0::2] | (vt[1::2] << 4)


def pack_natpair(vals):
    """natural order: byte row i packs elements (2i, 2i+1), low nibble first
    (pltpu.bitcast(u8, int4) doubles the sublane axis, low nibble first).
    XOR 8 as in pack_rowpair."""
    v = vals ^ 8
    return v[0::2] | (v[1::2] << 4)


def perm_rowpair(x2, bk):
    nb = bk // 32
    xr = x2.reshape(x2.shape[0], K // bk, nb, 32)
    return xr.swapaxes(-2, -1).reshape(x2.shape[0], K)


def expected_w4a16(vals, scale, x):
    deq = (vals.astype(np.int8) - 8).astype(np.float32) * \
        np.repeat(scale, 32, axis=0)
    return x @ deq


def quant_x_q8(x):
    """ggml quantize_row_q8_0 semantics per 32-block (ggml-quants.c:440)."""
    m = x.shape[0]
    xr = x.reshape(m, K // 32, 32)
    amax = np.abs(xr).max(axis=-1)
    d = amax / 127.0
    idv = np.where(d > 0, 1.0 / np.where(d > 0, d, 1), 0.0)
    x8 = np.round(xr * idv[..., None]).astype(np.int8)
    return x8, d.astype(np.float32)


def expected_w4a8(vals, scale, x):
    x8, dx = quant_x_q8(x)
    q = vals.astype(np.int32) - 8
    m = x.shape[0]
    out = np.zeros((m, N), np.float32)
    for b in range(K // 32):
        z = x8[:, b].astype(np.int32) @ q[32 * b:32 * (b + 1)]
        out += z.astype(np.float32) * (dx[:, b:b + 1] * scale[b][None, :])
    return out


# ------------------------------------------------------------- kernels ----
def _kern_ceiling(q_ref, o_ref, acc_ref):
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += q_ref[0:8, :].astype(jnp.int32).astype(jnp.float32)

    @pl.when(kk == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def run_ceiling(qs, bk, bn):
    out = pl.pallas_call(
        _kern_ceiling,
        grid=(N // bn, K // bk),
        in_specs=[pl.BlockSpec((bk // 2, bn), lambda nn, kk: (kk, nn),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, bn), lambda nn, kk: (0, nn),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(qs)
    return out


def _kern_rowpair(m, x_ref, qs_ref, s_ref, o_ref, acc_ref):
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = pltpu.bitcast(qs_ref[:], jnp.int4).astype(jnp.int8).astype(jnp.bfloat16)
    w = w * pltpu.repeat(s_ref[:].astype(jnp.bfloat16), 32, axis=0)
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(kk == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _kern_rowpair_sbf16(m, x_ref, qs_ref, s_ref, o_ref, acc_ref):
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = pltpu.bitcast(qs_ref[:], jnp.int4).astype(jnp.int8).astype(jnp.bfloat16)
    w = w * pltpu.repeat(s_ref[:], 32, axis=0)
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(kk == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _kern_rowpair_direct(m, x_ref, qs_ref, s_ref, o_ref, acc_ref):
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = pltpu.bitcast(qs_ref[:], jnp.int4).astype(jnp.bfloat16)
    w = w * pltpu.repeat(s_ref[:].astype(jnp.bfloat16), 32, axis=0)
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(kk == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def run_rowpair(kern, qs, scale, xp, bk, bn, m):
    nb = bk // 32
    out = pl.pallas_call(
        partial(kern, m),
        grid=(N // bn, K // bk),
        in_specs=[
            pl.BlockSpec((m, bk), lambda nn, kk: (0, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda nn, kk: (kk, nn), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, bn), lambda nn, kk: (kk, nn), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda nn, kk: (0, nn), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * K * N,
            bytes_accessed=K * N // 2 + K // 32 * N * 4 + m * K * 2 + m * N * 4,
            transcendentals=0),
    )(xp, qs, scale)
    return out


def _kern_w4a16_bd(nb, m, x_ref, qs_ref, s_ref, o_ref, acc_ref):
    """Per-block bf16 dots; the scale multiply moves to a per-block epilogue
    on the (m, bn) partial product instead of per weight element."""
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = pltpu.bitcast(qs_ref[:], jnp.int4).astype(jnp.int8).astype(jnp.bfloat16)
    acc = acc_ref[:]
    for b in range(nb):
        z = jnp.dot(x_ref[:, 32 * b:32 * (b + 1)], w[32 * b:32 * (b + 1), :],
                    preferred_element_type=jnp.float32)
        acc = acc + z * s_ref[b, :][None, :]
    acc_ref[:] = acc

    @pl.when(kk == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def run_w4a16_bd(qs, scale, x2, bk, bn, m):
    nb = bk // 32
    out = pl.pallas_call(
        partial(_kern_w4a16_bd, nb, m),
        grid=(N // bn, K // bk),
        in_specs=[
            pl.BlockSpec((m, bk), lambda nn, kk: (0, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda nn, kk: (kk, nn), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, bn), lambda nn, kk: (kk, nn), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda nn, kk: (0, nn), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(x2.astype(jnp.bfloat16), qs, scale)
    return out


def _kern_w4a8_rp(nb, m, x8_ref, qs_ref, s_ref, dx_ref, o_ref, acc_ref):
    """w4a8 math over the PRODUCTION rowpair u-order layout: bitcast rows are
    e-major (row = e*nb + b), so reshape (bk, bn) -> (32, nb, bn) recovers
    [e, b, :] and one batched dot_general contracts e per block b."""
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w8 = pltpu.bitcast(qs_ref[:], jnp.int4).astype(jnp.int8)   # (bk, bn)
    w8r = w8.reshape(32, nb, w8.shape[-1])
    acc = acc_ref[:]
    for b in range(nb):
        z = jax.lax.dot_general(x8_ref[b], w8r[:, b, :],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        acc = acc + z.astype(jnp.float32) * \
            (dx_ref[b][:, None] * s_ref[b][None, :])
    acc_ref[:] = acc

    @pl.when(kk == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def run_w4a8_rp(qs_rp, scale, x8t, dxt, bk, bn, m):
    nb = bk // 32
    out = pl.pallas_call(
        partial(_kern_w4a8_rp, nb, m),
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
    )(x8t, qs_rp, scale, dxt)
    return out


def _kern_w4a8(nb, m, x8_ref, qs_ref, s_ref, dx_ref, o_ref, acc_ref):
    """ggml vec_dot_q4_0_q8_0 on the MXU: int8 dots per 32-block, f32
    scale-product epilogue. Weights: bitcast + int4->int8 only."""
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w8 = pltpu.bitcast(qs_ref[:], jnp.int4).astype(jnp.int8)   # (bk, bn)
    acc = acc_ref[:]
    for b in range(nb):
        z = jax.lax.dot_general(
            x8_ref[b], w8[32 * b:32 * (b + 1), :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        acc = acc + z.astype(jnp.float32) * \
            (dx_ref[b][:, None] * s_ref[b][None, :])
    acc_ref[:] = acc

    @pl.when(kk == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def run_w4a8(qs, scale, x8t, dxt, bk, bn, m):
    nb = bk // 32
    out = pl.pallas_call(
        partial(_kern_w4a8, nb, m),
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
    return out


# -------------------------------------------------------------- timing ----
GEMV_BYTES = K * N // 2 + K // 32 * N * 4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-r", "--reps", type=int, default=16)
    ap.add_argument("-f", "--filter", default="")
    args = ap.parse_args()

    vals, scale_np, x_np = make_data()
    m = 1
    exp16 = expected_w4a16(vals, scale_np, x_np)
    exp8 = expected_w4a8(vals, scale_np, x_np)
    x8_np, dx_np = quant_x_q8(x_np)

    scale = jnp.asarray(scale_np)
    x = jnp.asarray(x_np)
    x8t = jnp.asarray(x8_np.transpose(1, 0, 2))      # (K/32, m, 32)
    dxt = jnp.asarray(dx_np.T)                       # (K/32, m)

    cases = []

    for bk, bn in [(512, 1024), (512, 2048), (1024, 1024), (1024, 2048),
                   (2048, 2048), (512, 4096)]:
        qs_rp = jnp.asarray(pack_rowpair(vals, bk))
        xp = jnp.asarray(perm_rowpair(x_np, bk))
        cases.append((f"rowpair bk={bk} bn={bn}",
                      (lambda qs_rp=qs_rp, xp=xp, bk=bk, bn=bn:
                       lambda s: run_rowpair(_kern_rowpair, qs_rp, scale,
                                             xp + s, bk, bn, m))(),
                      exp16))

    qs_rp = jnp.asarray(pack_rowpair(vals, 512))
    xp = jnp.asarray(perm_rowpair(x_np, 512))
    cases.append(("rowpair-sbf16 bk=512 bn=1024",
                  lambda s: run_rowpair(_kern_rowpair_sbf16, qs_rp,
                                        scale.astype(jnp.bfloat16),
                                        xp + s, 512, 1024, m), None))
    cases.append(("rowpair-direct-cast bk=512 bn=1024",
                  lambda s: run_rowpair(_kern_rowpair_direct, qs_rp, scale,
                                        xp + s, 512, 1024, m), exp16))

    qs_np_pair = pack_natpair(vals)
    qs_nat = jnp.asarray(qs_np_pair)
    for bk, bn in [(512, 1024), (512, 2048), (1024, 2048), (2048, 2048)]:
        cases.append((f"w4a16-blockdot bk={bk} bn={bn}",
                      (lambda bk=bk, bn=bn:
                       lambda s: run_w4a16_bd(qs_nat, scale, x + s, bk, bn, m))(),
                      exp16))

    for bk, bn in [(512, 1024), (512, 2048), (1024, 1024), (1024, 2048),
                   (2048, 2048), (512, 4096), (4096, 2048)]:
        cases.append((f"w4a8 bk={bk} bn={bn}",
                      (lambda bk=bk, bn=bn:
                       lambda s: run_w4a8(qs_nat, scale,
                                          (x8t + s.astype(jnp.int8)), dxt,
                                          bk, bn, m))(),
                      exp8))

    for bk, bn in [(512, 2048), (1024, 2048), (2048, 2048), (2048, 4096),
                   (4096, 4096)]:
        qs_rp = jnp.asarray(pack_rowpair(vals, bk))
        cases.append((f"w4a8-rp bk={bk} bn={bn}",
                      (lambda qs_rp=qs_rp, bk=bk, bn=bn:
                       lambda s: run_w4a8_rp(qs_rp, scale,
                                             (x8t + s.astype(jnp.int8)), dxt,
                                             bk, bn, m))(),
                      exp8))

    for bk, bn in [(512, 1024), (1024, 2048), (2048, 2048)]:
        cases.append((f"ceiling bk={bk} bn={bn}",
                      (lambda bk=bk, bn=bn:
                       lambda s: run_ceiling(qs_nat, bk, bn) + s)(), None))

    # production path for calibration (includes its activation permutation,
    # bf16 cast and dispatch glue — what the model actually pays per call)
    try:
        from ggml_imax_tpu.ops.pallas_qmm import repack_rowpair_device
        from ggml_imax_tpu.ops.qmatmul import qmatmul
        from ggml_imax_tpu.quant.device import quantize_for_device
        from ggml_imax_tpu.quant.formats import GGMLType
        wd = (np.random.default_rng(1).standard_normal((K, N)) * 0.02
              ).astype(np.float32)
        qt_rp = repack_rowpair_device(quantize_for_device(wd, GGMLType.Q4_0))
        xj = jnp.asarray(x_np)
        cases.append(("production qmatmul rowpair e2e",
                      lambda s: qmatmul(xj + s, qt_rp, out_dtype=jnp.float32),
                      None))
    except Exception as e:
        print(f"# production case skipped: {e}")

    print(f"# device: {jax.devices()[0].platform}, bytes/GEMV={GEMV_BYTES}")
    for name, fn, exp in cases:
        import re
        if args.filter and not re.search(args.filter, name):
            continue
        try:
            if exp is not None:
                got = np.asarray(fn(jnp.float32(0.0))[:m])
                err = np.abs(got - exp).max() / (np.abs(exp).max() + 1e-9)
                ok = "OK " if err < 2e-2 else f"ERR({err:.2e})"
            else:
                ok = "-- "
            dt = timeit_chain(fn, args.reps)
            print(f"{name:<36} {ok} {dt*1e6:9.1f} us  "
                  f"{GEMV_BYTES/dt/1e9:7.1f} GB/s eff", flush=True)
        except Exception as e:
            print(f"{name:<36} FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


def timeit_chain(fn, reps):
    """Chain via a scalar data dependency folded into the variant's input."""
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


if __name__ == "__main__":
    main()
