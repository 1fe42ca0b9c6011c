"""Continuous-batching engine tests — the main-batched.cpp semantics
(SURVEY.md §A.3): celled KV with seq ids, parallel sequences, O(1) fork.
Uses a tiny random GPT-2; greedy decoding must match the single-sequence
Engine exactly (same compiled math, different KV layout).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from ggml_imax_tpu.models import gpt2
from ggml_imax_tpu.quant.formats import GGMLType
from ggml_imax_tpu.runtime.batched import BatchedEngine
from ggml_imax_tpu.runtime.engine import Engine


@pytest.fixture(scope="module")
def tiny():
    cfg = gpt2.GPT2Config(n_vocab=96, n_ctx=128, n_embd=64, n_head=4,
                          n_layer=2)
    params = gpt2.synthetic_params(cfg, GGMLType.F32, seed=7)
    return cfg, params


def greedy_reference(cfg, params, prompt, n):
    eng = Engine(gpt2, cfg, params, compute_dtype=jnp.float32,
                 kv_dtype=jnp.float32)
    return eng.generate(prompt, n, temp=0.0)


def test_batched_matches_single_sequence(tiny):
    cfg, params = tiny
    prompt = [3, 14, 15, 92, 6]
    ref = greedy_reference(cfg, params, prompt, 8)

    be = BatchedEngine(gpt2, cfg, params, compute_dtype=jnp.float32,
                       kv_dtype=jnp.float32)
    rid = be.add_request(prompt, 8, temp=0.0)
    out = be.run()[rid]
    assert out == ref, (out, ref)


def test_batched_parallel_sequences(tiny):
    cfg, params = tiny
    prompts = [[3, 14, 15], [92, 6, 53, 35], [8]]
    refs = [greedy_reference(cfg, params, p, 6) for p in prompts]

    be = BatchedEngine(gpt2, cfg, params, compute_dtype=jnp.float32,
                       kv_dtype=jnp.float32)
    rids = [be.add_request(p, 6, temp=0.0) for p in prompts]
    outs = be.run()
    for rid, ref in zip(rids, refs):
        assert outs[rid] == ref


def test_batched_fork_shares_prefix(tiny):
    cfg, params = tiny
    prompt = [3, 14, 15, 92]
    be = BatchedEngine(gpt2, cfg, params, compute_dtype=jnp.float32,
                       kv_dtype=jnp.float32)
    rid = be.add_request(prompt, 5, temp=0.0)
    be.step()                       # prefill the prompt
    used_before = int((be.cell_pos >= 0).sum())
    assert used_before == len(prompt)
    fid = be.fork(rid)
    # O(1) fork: no new cells were allocated for the copy
    assert int((be.cell_pos >= 0).sum()) == used_before
    outs = be.run()
    ref = greedy_reference(cfg, params, prompt, 5)
    assert outs[rid] == ref
    assert outs[fid] == ref        # greedy fork follows the same path


def test_batched_cells_recycled_and_seq_reuse(tiny):
    cfg, params = tiny
    be = BatchedEngine(gpt2, cfg, params, n_ctx=64, compute_dtype=jnp.float32,
                       kv_dtype=jnp.float32)
    for round_ in range(3):
        rid = be.add_request([5 + round_, 9], 4, temp=0.0)
        be.run()
    # all requests finished -> every cell freed
    assert int((be.cell_pos >= 0).sum()) == 0
    assert len(be.requests) == 3


def test_engine_residency_q4_fused_with_model_fusion(rng):
    """Engine(residency='q4-fused') applies model-specific fusion (gptj
    fuse_qkv) + repack and still generates identically to as-is weights
    on the CPU fallback paths."""
    import jax.numpy as jnp
    from ggml_imax_tpu.models import gptj
    from ggml_imax_tpu.quant.formats import GGMLType
    cfg = gptj.GPTJConfig(n_vocab=64, n_ctx=64, n_embd=512, n_head=2,
                          n_layer=1, n_rot=32)
    params = gptj.synthetic_params(cfg, GGMLType.Q4_0, seed=9)
    ref = Engine(gptj, cfg, params, compute_dtype=jnp.float32,
                 kv_dtype=jnp.float32).generate([3, 5, 7], 5, temp=0.0)
    got = Engine(gptj, cfg, params, compute_dtype=jnp.float32,
                 kv_dtype=jnp.float32,
                 residency="q4-fused").generate([3, 5, 7], 5, temp=0.0)
    # fused QKV changes XLA reduction grouping -> tiny float noise; greedy
    # paths may only diverge if logits are near-ties, which synthetic
    # weights make vanishingly unlikely over 5 steps
    assert got == ref, (got, ref)


def test_batched_on_device_sampling_greedy_matches(tiny):
    cfg, params = tiny
    prompt = [3, 14, 15, 92, 6]
    ref = greedy_reference(cfg, params, prompt, 8)
    be = BatchedEngine(gpt2, cfg, params, compute_dtype=jnp.float32,
                       kv_dtype=jnp.float32, on_device_sampling=True)
    rid = be.add_request(prompt, 8, temp=0.0)
    out = be.run()[rid]
    assert out == ref, (out, ref)


def test_batched_on_device_sampling_stochastic(tiny):
    cfg, params = tiny
    be = BatchedEngine(gpt2, cfg, params, compute_dtype=jnp.float32,
                       kv_dtype=jnp.float32, on_device_sampling=True,
                       top_k=20, seed=4)
    rid = be.add_request([3, 14], 6, temp=0.9)
    out = be.run()[rid]
    assert len(out) == 6 and all(0 <= t < cfg.n_vocab for t in out)


def test_batched_per_request_sampling_params(tiny):
    """On-device sampling honors PER-REQUEST top_k/top_p/temp in one ubatch
    (the reference samples per request, common.h:114-132): a top_k=1 request
    must follow the greedy path even at high temperature, concurrently with
    a stochastic sibling and a temp=0 sibling."""
    cfg, params = tiny
    prompt = [3, 14, 15, 92, 6]
    ref = greedy_reference(cfg, params, prompt, 6)
    be = BatchedEngine(gpt2, cfg, params, compute_dtype=jnp.float32,
                       kv_dtype=jnp.float32, on_device_sampling=True, seed=11)
    r_k1 = be.add_request(prompt, 6, temp=3.0, top_k=1)
    r_hot = be.add_request([8, 9], 6, temp=1.2, top_k=50, top_p=0.95)
    r_greedy = be.add_request(prompt, 6, temp=0.0)
    outs = be.run()
    assert outs[r_k1] == ref, (outs[r_k1], ref)
    assert outs[r_greedy] == ref
    assert len(outs[r_hot]) == 6
    assert all(0 <= t < cfg.n_vocab for t in outs[r_hot])


def test_chunked_device_generate_matches_per_token(tiny):
    """Engine.generate(chunk=N) runs the decode loop on device (lax.scan +
    on-device sampling, one host fetch per span); greedy output must equal
    the per-token host loop exactly."""
    cfg, params = tiny
    prompt = [3, 14, 15, 92, 6]
    eng = Engine(gpt2, cfg, params, compute_dtype=jnp.float32,
                 kv_dtype=jnp.float32)
    ref = eng.generate(prompt, 9, temp=0.0)
    got = eng.generate(prompt, 9, temp=0.0, chunk=4)
    assert got == ref, (got, ref)


def test_chunked_device_generate_eos_and_ctx(tiny):
    """eos inside a span truncates; output never exceeds n_predict and the
    loop respects n_ctx."""
    cfg, params = tiny
    prompt = [3, 14, 15]
    eng = Engine(gpt2, cfg, params, compute_dtype=jnp.float32,
                 kv_dtype=jnp.float32)
    ref = eng.generate(prompt, 12, temp=0.0)
    eos = ref[5]
    got = eng.generate(prompt, 12, temp=0.0, chunk=5, eos_id=eos)
    want = ref[:ref.index(eos) + 1]
    assert got == want, (got, want)


def test_q8_kv_cache_matches_dense(tiny):
    """q8_0 KV residency (SURVEY §7's INT8 KV arena): greedy generation
    through an int8 cache must match the dense-cache output on a model whose
    logit margins dominate the ~0.4% cache quantization noise."""
    cfg, params = tiny
    prompt = [3, 14, 15, 92, 6]
    dense = Engine(gpt2, cfg, params, compute_dtype=jnp.float32,
                   kv_dtype=jnp.float32).generate(prompt, 8, temp=0.0)
    q8 = Engine(gpt2, cfg, params, compute_dtype=jnp.float32,
                kv_dtype="q8_0").generate(prompt, 8, temp=0.0)
    assert q8 == dense, (q8, dense)


def test_q8_kv_cache_celled(tiny):
    """Celled (continuous-batching) writes through the q8_0 cache."""
    cfg, params = tiny
    prompt = [3, 14, 15]
    ref = BatchedEngine(gpt2, cfg, params, compute_dtype=jnp.float32,
                        kv_dtype=jnp.float32)
    rid = ref.add_request(prompt, 6, temp=0.0)
    want = ref.run()[rid]
    be = BatchedEngine(gpt2, cfg, params, compute_dtype=jnp.float32,
                       kv_dtype="q8_0")
    rid = be.add_request(prompt, 6, temp=0.0)
    got = be.run()[rid]
    assert got == want, (got, want)


def test_engine_fused_decode_no_xla_fallback():
    """VERDICT r02 weak #4 contract: with residency='q4-fused', every
    quantized matmul in the Engine's decode step takes the fused kernel
    path — no layer silently falls back to the XLA dequant path (the
    published tok/s must be reproducible through the public API). Verified
    at the dispatch level: dequantize_xla must never be hit while tracing
    a decode step (GPT-J geometry incl. the non-128-multiple lm-head that
    prepare_fused pads)."""
    import importlib
    from ggml_imax_tpu.models import gptj
    qmm = importlib.import_module("ggml_imax_tpu.ops.qmatmul")

    cfg = gptj.GPTJConfig(n_vocab=1000, n_ctx=64, n_embd=256, n_head=2,
                          n_layer=2, n_rot=32)
    params = gptj.synthetic_params(cfg, GGMLType.Q4_0, seed=5)
    qmm.set_force_fused(True)
    calls = []
    real = qmm.dequantize_xla
    qmm.dequantize_xla = lambda qt, **kw: (calls.append(qt.name or qt.n),
                                           real(qt, **kw))[1]
    try:
        eng = Engine(gptj, cfg, params, residency="q4-fused")
        out = eng.generate([3, 5, 7], 2, temp=0.0)
        assert len(out) == 2
    finally:
        qmm.dequantize_xla = real
        qmm.set_force_fused(False)
    assert calls == [], f"XLA-dequant fallback hit for: {calls}"


def test_engine_residency_q4_stacked():
    """Engine(residency='q4-stacked') — the scan-over-layers fast path
    through the public API — generates identically to as-is weights."""
    import importlib
    from ggml_imax_tpu.models import gptj
    qmm = importlib.import_module("ggml_imax_tpu.ops.qmatmul")
    cfg = gptj.GPTJConfig(n_vocab=640, n_ctx=64, n_embd=256, n_head=2,
                          n_layer=2, n_rot=32)
    params = gptj.synthetic_params(cfg, GGMLType.Q4_0, seed=13)
    ref = Engine(gptj, cfg, params, compute_dtype=jnp.float32,
                 kv_dtype=jnp.float32).generate([3, 5, 7], 5, temp=0.0)
    qmm.set_force_fused(True)
    try:
        got = Engine(gptj, cfg, params,
                     residency="q4-stacked").generate([3, 5, 7], 5, temp=0.0)
    finally:
        qmm.set_force_fused(False)
    assert got == ref, (got, ref)


def test_batched_ubatch_chunked_prefill(tiny):
    """n_ubatch caps tokens per step (the reference's n_batch, common.h:26):
    a long prompt prefills across several ubatches and still generates
    exactly the single-sequence greedy output."""
    cfg, params = tiny
    prompt = list(np.random.default_rng(3).integers(0, 90, 50))
    ref = greedy_reference(cfg, params, prompt, 6)
    be = BatchedEngine(gpt2, cfg, params, compute_dtype=jnp.float32,
                       kv_dtype=jnp.float32, n_ubatch=16)
    rid = be.add_request(prompt, 6, temp=0.0)
    steps = 0
    while be.step():
        steps += 1
        assert steps < 64
    assert be.requests[rid].out == ref, (be.requests[rid].out, ref)
    assert steps >= 4          # 50 tokens at <=16/step -> >=4 prefill steps


def test_batched_stacked_matches_single_sequence(tiny):
    """BatchedEngine(stacked=True): celled continuous batching through the
    scan-over-layers body (update_kv_cells inside the scan) produces the
    same greedy output as the unstacked engine, incl. chunked prefill."""
    cfg, params = tiny
    prompts = [[3, 14, 15, 92, 6], [8, 9]]
    refs = [greedy_reference(cfg, params, p, 6) for p in prompts]
    be = BatchedEngine(gpt2, cfg, params, compute_dtype=jnp.float32,
                       kv_dtype=jnp.float32, stacked=True, n_ubatch=4)
    rids = [be.add_request(p, 6, temp=0.0) for p in prompts]
    outs = be.run()
    for rid, ref in zip(rids, refs):
        assert outs[rid] == ref, (outs[rid], ref)


def test_batched_stacked_cells_kernel_gptj():
    """BatchedEngine(stacked=True) on a D=128 model: decode-only ubatches
    take the fused cells kernel (per-row arena writes, one dispatch per
    layer) and still match the unstacked engine's greedy output."""
    import importlib
    from ggml_imax_tpu.models import gptj
    qmm = importlib.import_module("ggml_imax_tpu.ops.qmatmul")
    cfg = gptj.GPTJConfig(n_vocab=640, n_ctx=64, n_embd=256, n_head=2,
                          n_layer=2, n_rot=32)
    params = gptj.synthetic_params(cfg, GGMLType.Q4_0, seed=17)
    prompts = [[3, 5, 7, 11], [13, 17]]
    ref_eng = BatchedEngine(gptj, cfg, params, compute_dtype=jnp.float32,
                            kv_dtype=jnp.float32)
    rids = [ref_eng.add_request(p, 5, temp=0.0) for p in prompts]
    refs = ref_eng.run()

    qmm.set_force_fused(True)
    try:
        be = BatchedEngine(gptj, cfg, params, stacked=True)
        rids2 = [be.add_request(p, 5, temp=0.0) for p in prompts]
        outs = be.run()
    finally:
        qmm.set_force_fused(False)
    for ra, rb in zip(rids, rids2):
        assert outs[rb] == refs[ra], (outs[rb], refs[ra])


def test_batched_stacked_llama_gqa():
    """BatchedEngine(stacked=True) over LLaMA with GQA: decode-only ubatches
    route through the cells kernel (D=128), greedy parity vs unstacked."""
    import importlib
    from ggml_imax_tpu.models import llama
    from ggml_imax_tpu.quant.device import quantize_for_device
    qmm = importlib.import_module("ggml_imax_tpu.ops.qmatmul")
    cfg = llama.LlamaConfig(n_vocab=640, n_ctx=64, n_embd=256, n_head=2,
                            n_head_kv=1, n_layer=2, n_ff=512)
    rng = np.random.default_rng(41)
    q = lambda s: quantize_for_device(
        (rng.standard_normal(s) * 0.05).astype(np.float32), GGMLType.Q4_0)
    vec = lambda n: jnp.asarray(
        (rng.standard_normal(n) * 0.05).astype(np.float32))
    E, F, KV = cfg.n_embd, cfg.n_ff, cfg.n_head_kv * cfg.head_dim
    params = {"tok_embd": q((E, cfg.n_vocab)), "out_norm": vec(E) + 1.0,
              "output": None, "layers": []}
    for _ in range(cfg.n_layer):
        params["layers"].append({
            "attn_norm": vec(E) + 1.0,
            "q_w": q((E, E)), "k_w": q((E, KV)), "v_w": q((E, KV)),
            "o_w": q((E, E)), "ffn_norm": vec(E) + 1.0,
            "gate_w": q((E, F)), "up_w": q((E, F)), "down_w": q((F, E)),
        })
    ref_eng = BatchedEngine(llama, cfg, params, compute_dtype=jnp.float32,
                            kv_dtype=jnp.float32)
    rids = [ref_eng.add_request(p, 4, temp=0.0)
            for p in ([3, 5, 7], [11, 13])]
    refs = ref_eng.run()
    qmm.set_force_fused(True)
    try:
        be = BatchedEngine(llama, cfg, params, stacked=True)
        rids2 = [be.add_request(p, 4, temp=0.0) for p in ([3, 5, 7], [11, 13])]
        outs = be.run()
    finally:
        qmm.set_force_fused(False)
    for ra, rb in zip(rids, rids2):
        assert outs[rb] == refs[ra], (outs[rb], refs[ra])


def test_engine_q4_stacked_chunked_generate():
    """residency='q4-stacked' composes with the on-device chunked decode
    loop (lax.scan over the scan-over-layers step, one fetch per span)."""
    import importlib
    from ggml_imax_tpu.models import gptj
    qmm = importlib.import_module("ggml_imax_tpu.ops.qmatmul")
    cfg = gptj.GPTJConfig(n_vocab=640, n_ctx=64, n_embd=256, n_head=2,
                          n_layer=2, n_rot=32)
    params = gptj.synthetic_params(cfg, GGMLType.Q4_0, seed=19)
    qmm.set_force_fused(True)
    try:
        eng = Engine(gptj, cfg, params, residency="q4-stacked")
        ref = eng.generate([3, 5, 7], 6, temp=0.0)
        got = eng.generate([3, 5, 7], 6, temp=0.0, chunk=3)
    finally:
        qmm.set_force_fused(False)
    assert got == ref, (got, ref)


def test_find_slot_head_cursor_and_wraparound(tiny):
    """VERDICT r03 item 5: _find_slot keeps a head cursor (O(1) amortized,
    the reference's head += n_tokens, main-batched.cpp:976-981) and reuses
    freed cells after wraparound."""
    cfg, params = tiny
    be = BatchedEngine(gpt2, cfg, params, compute_dtype=jnp.float32,
                       n_ctx=17)            # 16 usable cells + trash
    # sequential appends just bump the cursor
    a = be._find_slot(4)
    b = be._find_slot(4)
    assert (a, b) == (0, 4) and be.head == 8
    for i in range(8):
        be.cell_pos[i] = i                  # mark occupied
        be.cell_seq[i] = np.uint32(1 << (0 if i < 4 else 1))
    c = be._find_slot(8)                    # fills the rest exactly
    assert c == 8 and be.head == 16
    be.cell_pos[8:16] = 9
    be.cell_seq[8:16] = np.uint32(1 << 2)
    with pytest.raises(RuntimeError):
        be._find_slot(1)                    # pool genuinely full
    # free the FIRST sequence's run -> wraparound reuse at the front
    be.cell_seq[0:4] = 0
    be.cell_pos[0:4] = -1
    d = be._find_slot(3)
    assert d == 0 and be.head == 3
    # the trash cell is never handed out even when free
    be.cell_pos[:] = 5
    be.cell_pos[be.trash_cell] = -1
    with pytest.raises(RuntimeError):
        be._find_slot(1)


def test_step_chunk_matches_single_steps(tiny):
    """step_chunk(k) must produce exactly the tokens k single greedy steps
    produce: same forward math, same cells semantics — only the host round
    trips are amortized (chunked serving decode, r04)."""
    cfg, params = tiny
    prompts = [[3, 14, 15], [92, 6, 53, 35], [8, 44]]

    ref = BatchedEngine(gpt2, cfg, params, compute_dtype=jnp.float32,
                        kv_dtype=jnp.float32, on_device_sampling=True)
    rids_r = [ref.add_request(p, 11, temp=0.0) for p in prompts]
    while ref.step():
        pass

    be = BatchedEngine(gpt2, cfg, params, compute_dtype=jnp.float32,
                       kv_dtype=jnp.float32, on_device_sampling=True)
    rids_c = [be.add_request(p, 11, temp=0.0) for p in prompts]
    while be.step_chunk(4):
        pass
    for rr, rc in zip(rids_r, rids_c):
        assert be.requests[rc].out == ref.requests[rr].out, \
            (be.requests[rc].out, ref.requests[rr].out)


def test_step_chunk_eos_and_cell_reuse(tiny):
    """A request hitting EOS mid-chunk stops there (post-EOS chunk tokens
    are discarded) and its cells — including the pre-registered unused
    chunk cells — are freed for later requests."""
    cfg, params = tiny
    be = BatchedEngine(gpt2, cfg, params, compute_dtype=jnp.float32,
                       kv_dtype=jnp.float32, on_device_sampling=True,
                       n_ctx=64)
    # find the greedy continuation first so we can plant its 2nd token as
    # the EOS id (forces EOS mid-chunk)
    probe = be.add_request([5, 9, 3], 8, temp=0.0)
    while be.step_chunk(4):
        pass
    out = be.requests[probe].out
    del be.requests[probe]

    eos = out[1]
    rid = be.add_request([5, 9, 3], 8, temp=0.0, eos_id=eos)
    while be.step_chunk(4):
        pass
    # stops at the FIRST appended eos token (out[0] may already equal it)
    want = out[:out.index(eos) + 1]
    assert be.requests[rid].out == want, (be.requests[rid].out, want)
    assert (be.cell_pos[:-1] == -1).all()          # all cells freed
    # the pool is reusable afterwards
    rid2 = be.add_request([7, 2], 6, temp=0.0)
    while be.step_chunk(4):
        pass
    assert len(be.requests[rid2].out) == 6

def test_run_pipelined_matches_single_steps(tiny):
    """run_pipelined(k) — double-buffered chunk dispatch (chunk j+1 runs
    from chunk j's device token carry before j's tokens are fetched) —
    must produce exactly the greedy tokens the per-step loop produces,
    including requests whose n_predict is not a multiple of k."""
    cfg, params = tiny
    prompts = [[3, 14, 15], [92, 6, 53, 35], [8, 44]]
    npreds = [11, 7, 18]

    ref = BatchedEngine(gpt2, cfg, params, compute_dtype=jnp.float32,
                        kv_dtype=jnp.float32, on_device_sampling=True)
    rids_r = [ref.add_request(p, n, temp=0.0)
              for p, n in zip(prompts, npreds)]
    while ref.step():
        pass

    be = BatchedEngine(gpt2, cfg, params, compute_dtype=jnp.float32,
                       kv_dtype=jnp.float32, on_device_sampling=True)
    rids_c = [be.add_request(p, n, temp=0.0)
              for p, n in zip(prompts, npreds)]
    outs = be.run_pipelined(4)
    for rr, rc in zip(rids_r, rids_c):
        assert outs[rc] == ref.requests[rr].out, \
            (outs[rc], ref.requests[rr].out)
    assert (be.cell_pos[:-1] == -1).all()          # all cells freed


def test_run_pipelined_eos_discard_and_cell_reuse(tiny):
    """EOS hit while a successor chunk is in flight: the successor's
    tokens for that row are discarded, its cells (incl. the in-flight
    chunk's pre-registered ones) are freed, and the pool stays usable."""
    cfg, params = tiny
    be = BatchedEngine(gpt2, cfg, params, compute_dtype=jnp.float32,
                       kv_dtype=jnp.float32, on_device_sampling=True,
                       n_ctx=64)
    probe = be.add_request([5, 9, 3], 12, temp=0.0)
    be.run_pipelined(3)
    out = be.requests[probe].out
    del be.requests[probe]

    eos = out[4]                     # mid-second-chunk with k=3
    rid = be.add_request([5, 9, 3], 12, temp=0.0, eos_id=eos)
    be.run_pipelined(3)
    want = out[:out.index(eos) + 1]
    assert be.requests[rid].out == want, (be.requests[rid].out, want)
    assert (be.cell_pos[:-1] == -1).all()
    rid2 = be.add_request([7, 2], 6, temp=0.0)
    be.run_pipelined(3)
    assert len(be.requests[rid2].out) == 6

def test_chunked_ctx_edge_keeps_valid_tokens(tiny):
    """A chunk that lands exactly at the arena edge must keep its valid
    tokens: the retire loops check each token's own feed position, not
    the already-advanced r.pos (which spuriously discarded up to 2k-1
    tokens at the boundary)."""
    cfg, params = tiny
    prompt = [5, 9, 3]
    n_ctx = 24                       # room for 3 + 17 fed tokens
    ref = BatchedEngine(gpt2, cfg, params, compute_dtype=jnp.float32,
                        kv_dtype=jnp.float32, on_device_sampling=True,
                        n_ctx=n_ctx)
    r0 = ref.add_request(prompt, 100, temp=0.0)
    while ref.step():
        pass
    want = ref.requests[r0].out
    assert len(want) > 8             # the run is genuinely ctx-bounded

    ck = BatchedEngine(gpt2, cfg, params, compute_dtype=jnp.float32,
                       kv_dtype=jnp.float32, on_device_sampling=True,
                       n_ctx=n_ctx)
    r1 = ck.add_request(prompt, 100, temp=0.0)
    while ck.step_chunk(8):
        pass
    assert ck.requests[r1].out == want, (ck.requests[r1].out, want)

    pp = BatchedEngine(gpt2, cfg, params, compute_dtype=jnp.float32,
                       kv_dtype=jnp.float32, on_device_sampling=True,
                       n_ctx=n_ctx)
    r2 = pp.add_request(prompt, 100, temp=0.0)
    outs = pp.run_pipelined(8)
    assert outs[r2] == want, (outs[r2], want)
