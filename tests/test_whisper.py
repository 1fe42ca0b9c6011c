"""Whisper parity vs HuggingFace (tiny random model, torch CPU) + mel
frontend parity vs WhisperFeatureExtractor — the analog of the reference's
whisper CI transcription golden test (ci/run.sh:144-158) without audio
downloads.
"""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from ggml_imax_tpu.models import whisper as W
from ggml_imax_tpu.quant.formats import GGMLType


def tiny_pair(seed=0):
    torch.manual_seed(seed)
    hf_cfg = transformers.WhisperConfig(
        vocab_size=128, num_mel_bins=16, d_model=32,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=32, max_target_positions=24,
        # keep generation-special ids inside the tiny vocab
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=3, suppress_tokens=None,
        begin_suppress_tokens=None, forced_decoder_ids=None)
    model = transformers.WhisperForConditionalGeneration(hf_cfg).eval()
    sd = {k.removeprefix("model."): v.numpy()
          for k, v in model.state_dict().items()}
    cfg = W.WhisperConfig(n_vocab=128, n_audio_ctx=32, n_audio_state=32,
                          n_audio_head=4, n_audio_layer=2, n_text_ctx=24,
                          n_text_state=32, n_text_head=4, n_text_layer=2,
                          n_mels=16)
    params = W.from_hf_state_dict(cfg, sd, GGMLType.F32)
    return hf_cfg, model, cfg, params


def test_whisper_encoder_parity():
    hf_cfg, model, cfg, params = tiny_pair()
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 16, 64)).astype(np.float32)
    enc = W.encode(cfg, params, jnp.asarray(mel),
                   compute_dtype=jnp.float32, precision="highest")
    with torch.no_grad():
        ref = model.model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    err = np.abs(np.asarray(enc) - ref).max()
    assert err < 2e-4, err


def test_whisper_decoder_logits_parity_and_cache():
    hf_cfg, model, cfg, params = tiny_pair()
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, 16, 64)).astype(np.float32)
    toks = rng.integers(0, 128, (1, 6)).astype(np.int32)

    with torch.no_grad():
        ref = model(input_features=torch.from_numpy(mel),
                    decoder_input_ids=torch.tensor(toks.astype(np.int64))
                    ).logits.numpy()

    enc = W.encode(cfg, params, jnp.asarray(mel),
                   compute_dtype=jnp.float32, precision="highest")
    cross = W.precompute_cross_kv(cfg, params, enc,
                                  compute_dtype=jnp.float32,
                                  precision="highest")
    cache = W.init_cache(cfg, dtype=jnp.float32)
    pos = np.arange(6, dtype=np.int32)[None]
    logits, cache = W.decode(cfg, params, jnp.asarray(toks), jnp.asarray(pos),
                             cache, cross, 0, compute_dtype=jnp.float32,
                             precision="highest")
    err = np.abs(np.asarray(logits) - ref).max()
    assert err < 2e-3, err

    # incremental decode through the KV cache must match a fresh full pass
    tok7 = rng.integers(0, 128, (1, 1)).astype(np.int32)
    pos7 = np.full((1, 1), 6, np.int32)
    inc, _ = W.decode(cfg, params, jnp.asarray(tok7), jnp.asarray(pos7),
                      cache, cross, 6, compute_dtype=jnp.float32,
                      precision="highest")
    full_toks = np.concatenate([toks, tok7], axis=1)
    with torch.no_grad():
        full = model(input_features=torch.from_numpy(mel),
                     decoder_input_ids=torch.tensor(full_toks.astype(np.int64))
                     ).logits.numpy()
    err = np.abs(np.asarray(inc)[0, 0] - full[0, -1]).max()
    assert err < 2e-3, err


def test_mel_frontend_parity_vs_hf():
    from transformers import WhisperFeatureExtractor
    from ggml_imax_tpu.audio.mel import log_mel_spectrogram, mel_filterbank
    rng = np.random.default_rng(2)
    samples = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    fe = WhisperFeatureExtractor()
    ref = fe(samples, sampling_rate=16000, return_tensors="np")["input_features"][0]
    got = np.asarray(log_mel_spectrogram(samples))[:, :3000]
    assert np.abs(ref - got).max() < 1e-5
    assert np.abs(np.asarray(fe.mel_filters).T - mel_filterbank()).max() < 1e-8


def test_wav_roundtrip(tmp_path):
    from ggml_imax_tpu.audio.wav import read_wav, write_wav, vad_simple
    rng = np.random.default_rng(3)
    pcm = (rng.standard_normal(16000) * 0.2).astype(np.float32)
    p = tmp_path / "t.wav"
    write_wav(p, pcm)
    back = read_wav(p)
    assert back.shape == pcm.shape
    assert np.abs(back - np.clip(pcm, -1, 1)).max() < 2e-4
    # quiet tail after loud head -> VAD fires
    sig = np.concatenate([pcm, np.zeros(32000, np.float32)])
    assert vad_simple(sig, last_ms=1000, freq_thold=0.0)


def test_whisper_pipeline_transcribe_smoke():
    """End-to-end whisper_full analog on a random tiny model: beam search,
    temperature fallback, segmentation — checks mechanics, not quality."""
    from ggml_imax_tpu.runtime.whisper_pipeline import (FullParams,
                                                        WhisperPipeline)
    from ggml_imax_tpu.audio.mel import mel_filterbank
    _, _, cfg, params = tiny_pair(seed=4)
    vocab = [f"<{i}>".encode() for i in range(cfg.n_vocab)]
    pipe = WhisperPipeline(cfg, params, mel_filterbank(cfg.n_mels),
                           vocab, compute_dtype=jnp.float32)
    rng = np.random.default_rng(5)
    samples = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    fp = FullParams(beam_size=2, max_tokens=6,
                    temperatures=(0.0, 0.5), logprob_thold=-1e9,
                    entropy_thold=1e9)
    segs = pipe.transcribe(samples, fp)
    assert len(segs) == 1
    assert len(segs[0].tokens) <= 6
    assert segs[0].temperature == 0.0         # QC passes at first temp
    assert isinstance(segs[0].text, str)

    # with DTW token timestamps
    fp2 = FullParams(beam_size=1, max_tokens=4, temperatures=(0.0,),
                     logprob_thold=-1e9, entropy_thold=1e9,
                     token_timestamps=True)
    segs2 = pipe.transcribe(samples, fp2)
    tt = segs2[0].token_times
    assert tt is not None and len(tt) == len(segs2[0].tokens)
    assert all(b >= a for a, b in zip(tt, tt[1:]))


def test_dtw_token_timestamps():
    """DTW token-level timestamps (whisper.cpp:355-378 analog): monotonic,
    bounded by the audio window, one per token."""
    from ggml_imax_tpu.runtime.whisper_pipeline import (WhisperPipeline,
                                                        token_timestamps)
    _, _, cfg, params = tiny_pair(seed=6)
    pipe = WhisperPipeline(cfg, params, None, None, compute_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((1, 16, 64)).astype(np.float32))
    enc = W.encode(cfg, params, mel, compute_dtype=jnp.float32)
    cross = W.precompute_cross_kv(cfg, params, enc, compute_dtype=jnp.float32)
    toks = [3, 5, 7, 9, 11, 13]
    ts = token_timestamps(pipe, cross, toks, t_offset=1.0)
    assert len(ts) == len(toks)
    assert np.all(np.diff(ts) >= 0)                  # monotonic
    assert ts[0] >= 1.0 and ts[-1] <= 1.0 + cfg.n_audio_ctx * 0.02
    # explicit alignment heads path
    ts2 = token_timestamps(pipe, cross, toks, alignment_heads=[(1, 0), (1, 1)])
    assert len(ts2) == len(toks) and np.all(np.diff(ts2) >= 0)


def test_dtw_path_shape():
    from ggml_imax_tpu.runtime.whisper_pipeline import _dtw_path
    # diagonal-dominant cost -> near-diagonal path
    n, m = 6, 12
    cost = np.ones((n, m))
    for i in range(n):
        cost[i, 2 * i] = 0.0
    match = _dtw_path(cost)                # first-visit column per row
    assert match.shape == (n,)
    assert np.all(np.diff(match) >= 0) and match[0] == 0
    np.testing.assert_array_equal(match, 2 * np.arange(n))  # follows diagonal


def test_whisper_legacy_bin_loader_roundtrip(tmp_path):
    """Write a tiny whisper .bin (magic, 11 hparams, mel filters, vocab,
    tensors — whisper.cpp:1320-1750 layout) from HF-mapped params and load
    it back through whisper.load_legacy."""
    import struct
    from ggml_imax_tpu.quant import codecs
    from ggml_imax_tpu.quant.formats import GGMLType

    _, _, cfg, params = tiny_pair(seed=8)
    buf = bytearray()
    buf += struct.pack("<I", 0x67676D6C)
    buf += struct.pack("<11i", cfg.n_vocab, cfg.n_audio_ctx,
                       cfg.n_audio_state, cfg.n_audio_head,
                       cfg.n_audio_layer, cfg.n_text_ctx, cfg.n_text_state,
                       cfg.n_text_head, cfg.n_text_layer, cfg.n_mels, 0)
    filters = np.linspace(0, 1, cfg.n_mels * 201, dtype=np.float32)
    buf += struct.pack("<2i", cfg.n_mels, 201)
    buf += filters.tobytes()
    vocab = [f"t{i}".encode() for i in range(cfg.n_vocab)]
    buf += struct.pack("<i", len(vocab))
    for v in vocab:
        buf += struct.pack("<I", len(v)) + v

    def add(name, arr):
        a = np.ascontiguousarray(np.asarray(arr, np.float32))
        ne = tuple(reversed(a.shape))
        nb = name.encode()
        hdr = struct.pack("<3i", len(ne), len(nb), int(GGMLType.F32))
        return hdr + b"".join(struct.pack("<i", d) for d in ne) + nb + a.tobytes()

    def qt2np(qt):
        from ggml_imax_tpu.quant.device import dequantize_qtensor
        return dequantize_qtensor(qt).T          # back to (N rows, K)

    out = b""
    out += add("encoder.positional_embedding", np.asarray(params["e_pe"]))
    out += add("encoder.conv1.weight", np.asarray(params["e_conv1_w"]))
    out += add("encoder.conv1.bias", np.asarray(params["e_conv1_b"]).reshape(-1))
    out += add("encoder.conv2.weight", np.asarray(params["e_conv2_w"]))
    out += add("encoder.conv2.bias", np.asarray(params["e_conv2_b"]).reshape(-1))
    out += add("encoder.ln_post.weight", np.asarray(params["e_ln_g"]))
    out += add("encoder.ln_post.bias", np.asarray(params["e_ln_b"]))
    out += add("decoder.token_embedding.weight", qt2np(params["d_te"]))
    out += add("decoder.positional_embedding", np.asarray(params["d_pe"]))
    out += add("decoder.ln.weight", np.asarray(params["d_ln_g"]))
    out += add("decoder.ln.bias", np.asarray(params["d_ln_b"]))
    enc_map = [("attn_ln.weight", "ln0_g"), ("attn_ln.bias", "ln0_b"),
               ("attn.query.weight", "q_w"), ("attn.query.bias", "q_b"),
               ("attn.key.weight", "k_w"), ("attn.value.weight", "v_w"),
               ("attn.value.bias", "v_b"), ("attn.out.weight", "o_w"),
               ("attn.out.bias", "o_b"), ("mlp_ln.weight", "ln1_g"),
               ("mlp_ln.bias", "ln1_b"), ("mlp.0.weight", "mlp0_w"),
               ("mlp.0.bias", "mlp0_b"), ("mlp.2.weight", "mlp1_w"),
               ("mlp.2.bias", "mlp1_b")]
    for i, lp in enumerate(params["enc_layers"]):
        for fname, key in enc_map:
            v = lp[key]
            arr = qt2np(v) if hasattr(v, "kind") else np.asarray(v)
            out += add(f"encoder.blocks.{i}.{fname}", arr)
    dec_map = enc_map + [
        ("cross_attn_ln.weight", "xln_g"), ("cross_attn_ln.bias", "xln_b"),
        ("cross_attn.query.weight", "xq_w"), ("cross_attn.query.bias", "xq_b"),
        ("cross_attn.key.weight", "xk_w"), ("cross_attn.value.weight", "xv_w"),
        ("cross_attn.value.bias", "xv_b"), ("cross_attn.out.weight", "xo_w"),
        ("cross_attn.out.bias", "xo_b")]
    for i, lp in enumerate(params["dec_layers"]):
        for fname, key in dec_map:
            v = lp[key]
            arr = qt2np(v) if hasattr(v, "kind") else np.asarray(v)
            out += add(f"decoder.blocks.{i}.{fname}", arr)

    path = tmp_path / "whisper-tiny.bin"
    path.write_bytes(bytes(buf) + out)

    cfg2, p2, filt2, vocab2 = W.load_legacy(path)
    assert cfg2 == cfg
    np.testing.assert_array_equal(filt2.reshape(-1), filters)
    assert vocab2[:3] == [b"t0", b"t1", b"t2"]

    rng = np.random.default_rng(2)
    mel = jnp.asarray(rng.standard_normal((1, 16, 64)).astype(np.float32))
    e1 = np.asarray(W.encode(cfg, params, mel, compute_dtype=jnp.float32))
    e2 = np.asarray(W.encode(cfg2, p2, mel, compute_dtype=jnp.float32))
    np.testing.assert_allclose(e1, e2, rtol=2e-3, atol=2e-3)


def _tone_signal(seconds=2.5):
    """Deterministic structured audio: two tones + a chirp."""
    t = np.arange(int(seconds * 16000)) / 16000.0
    return (0.3 * np.sin(2 * np.pi * 440 * t)
            + 0.2 * np.sin(2 * np.pi * 880 * t)
            + 0.1 * np.sin(2 * np.pi * (200 + 300 * t) * t)).astype(np.float32)


def _golden_pipe():
    from ggml_imax_tpu.audio.mel import mel_filterbank
    from ggml_imax_tpu.runtime.whisper_pipeline import (FullParams,
                                                        WhisperPipeline)
    _, _, cfg, params = tiny_pair(seed=4)
    vocab = [f"<{i}>".encode() for i in range(cfg.n_vocab)]
    pipe = WhisperPipeline(cfg, params, mel_filterbank(cfg.n_mels), vocab,
                           compute_dtype=jnp.float32)
    fp = FullParams(beam_size=1, max_tokens=8, temperatures=(0.0,),
                    logprob_thold=-1e9, entropy_thold=1e9)
    return pipe, fp


GOLDEN_TOKENS = [127, 127, 127, 127, 127, 127, 127, 127]
GOLDEN_AVG_LP = -4.299748      # pinned to 1e-3: captures the full numeric path


def test_whisper_golden_transcript():
    """Fixed-seed golden end-to-end transcript (the jfk.wav golden of the
    reference CI, ci/run.sh:144-158, without downloadable audio): greedy
    decode of deterministic audio through the fixed-seed tiny model must
    produce exactly the pinned token sequence. Catches any silent numeric
    or decoding-logic drift in the whole encode->decode->segment path."""
    pipe, fp = _golden_pipe()
    segs = pipe.transcribe(_tone_signal(), fp)
    assert len(segs) == 1
    assert segs[0].tokens == GOLDEN_TOKENS, segs[0].tokens
    assert abs(segs[0].avg_logprob - GOLDEN_AVG_LP) < 1e-3, \
        segs[0].avg_logprob


def test_whisper_full_parallel():
    """transcribe_parallel (whisper_full_parallel analog): each span decodes
    independently; segment times are offset by span start; n_processors=1
    degenerates to transcribe."""
    pipe, fp = _golden_pipe()
    sig = np.concatenate([_tone_signal(), _tone_signal()])
    segs = pipe.transcribe_parallel(sig, fp, n_processors=2)
    assert len(segs) == 2
    # both spans carry the same audio -> same golden tokens, shifted times
    assert segs[0].tokens == GOLDEN_TOKENS
    assert segs[1].tokens == GOLDEN_TOKENS
    # spans land on whole seconds: 5 s / 2 -> [0, 2) + [2, 5)
    assert segs[0].t0 == 0.0 and abs(segs[1].t0 - 2.0) < 1e-9
    one = pipe.transcribe_parallel(_tone_signal(), fp, n_processors=1)
    assert len(one) == 1 and one[0].tokens == GOLDEN_TOKENS


def test_whisper_stacked_decoder_matches():
    """Stacked decoder (scan-over-layers, stacked GEMV kernels) matches the
    unstacked decode() logits over prefill + 2 decode steps."""
    import importlib
    from ggml_imax_tpu.ops.pallas_qmm import params_repack_device
    qmm = importlib.import_module("ggml_imax_tpu.ops.qmatmul")

    cfg = W.WhisperConfig(n_vocab=512, n_audio_ctx=32, n_audio_state=256,
                          n_audio_head=2, n_audio_layer=2, n_text_ctx=32,
                          n_text_state=256, n_text_head=2, n_text_layer=2,
                          n_mels=16)
    params = W.synthetic_params_device(cfg, GGMLType.Q5_0, seed=2)
    mel = np.random.default_rng(0).standard_normal(
        (1, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32) * 0.3
    enc = W.encode(cfg, params, mel)
    cross = W.precompute_cross_kv(cfg, params, enc)

    stk = W.stack_decoder(params_repack_device(W.prepare_fused(params)))

    toks = jnp.asarray([[cfg.token_sot % cfg.n_vocab, 5, 7]], jnp.int32)
    pos = jnp.asarray(np.arange(3, dtype=np.int32)[None])
    c1 = W.init_cache(cfg, batch=1)
    c2 = W.init_cache(cfg, batch=1)
    l1, c1 = W.decode(cfg, params, toks, pos, c1, cross, 0)
    qmm.set_force_fused(True)
    try:
        l2, c2 = W.decode(cfg, stk, toks, pos, c2, cross, 0)
        np.testing.assert_allclose(np.asarray(l2), np.asarray(l1),
                                   rtol=3e-2, atol=3e-2)
        for i in range(2):
            tok = jnp.argmax(l1[:, -1:], -1).astype(jnp.int32)
            pp = jnp.full((1, 1), 3 + i, jnp.int32)
            l1, c1 = W.decode(cfg, params, tok, pp, c1, cross, 3 + i)
            l2, c2 = W.decode(cfg, stk, tok, pp, c2, cross, 3 + i)
            np.testing.assert_allclose(np.asarray(l2), np.asarray(l1),
                                       rtol=3e-2, atol=3e-2)
    finally:
        qmm.set_force_fused(False)


def test_whisper_pipeline_stacked_decoder():
    """WhisperPipeline drives the STACKED decoder end to end (transcribe
    with greedy beam) and matches the unstacked pipeline's tokens on the
    same audio — the stacked layout is a drop-in for serving."""
    import importlib
    from ggml_imax_tpu.runtime.whisper_pipeline import (FullParams,
                                                        WhisperPipeline)
    from ggml_imax_tpu.audio.mel import mel_filterbank
    from ggml_imax_tpu.ops.pallas_qmm import params_repack_device
    qmm = importlib.import_module("ggml_imax_tpu.ops.qmatmul")

    _, _, cfg, params = tiny_pair(seed=4)
    vocab = [f"<{i}>".encode() for i in range(cfg.n_vocab)]
    rng = np.random.default_rng(5)
    samples = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    fp = FullParams(beam_size=1, max_tokens=5, temperatures=(0.0,),
                    logprob_thold=-1e9, entropy_thold=1e9)

    pipe = WhisperPipeline(cfg, params, mel_filterbank(cfg.n_mels),
                           vocab, compute_dtype=jnp.float32)
    ref = pipe.transcribe(samples, fp)

    stk = W.stack_decoder(params_repack_device(W.prepare_fused(params)))
    pipe2 = WhisperPipeline(cfg, stk, mel_filterbank(cfg.n_mels),
                            vocab, compute_dtype=jnp.float32)
    got = pipe2.transcribe(samples, fp)
    assert [s.tokens for s in got] == [s.tokens for s in ref]
