"""whisper_full pipeline — chunked transcription with beam search and
temperature fallback.

Reference: whisper_full_with_state (/root/reference/examples/whisper/
whisper.cpp:4850+, params :4688-4725):
- 30 s sliding windows over the mel spectrogram (seek loop),
- initial prompt [sot, lang, task, (no-)timestamps] (whisper.cpp:4950+),
- per temperature in {0.0, 0.2, ..., 1.0}: beam search (temp==0, beam_size
  from params) or best-of sampling, then quality control — fallback to the
  next temperature when avg token logprob < logprob_thold or the token
  entropy signals degenerate repetition (entropy_thold; the reference
  computes it over token repeat counts, whisper.cpp:752-803),
- decoder state kept in kv_self; cross-KV computed once per window.

TPU-native: the decode step is one jitted function over a donated KV cache
with batch = beam width; beam reordering gathers the cache along the batch
axis on device. The encoder + cross-KV precompute compile once per window
shape. Beam bookkeeping (token append, finished handling) stays on host —
it is O(beam) per step and off the critical path, like the reference's
host-side whisper_sequence logic.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.mel import HOP_LENGTH, N_SAMPLES, SAMPLE_RATE, log_mel_spectrogram
from ..models import whisper as W

# openai whisper language ordering: id(lang) = token_sot + 1 + index
LANGUAGES = (
    "en zh de es ru ko fr ja pt tr pl ca nl ar sv it id hi fi vi he uk el ms "
    "cs ro da hu ta no th ur hr bg lt la mi ml cy sk te fa lv bn sr az sl kn "
    "et mk br eu is hy ne mn bs kk sq sw gl mr pa si km sn yo so af oc ka be "
    "tg sd gu am yi lo uz fo ht ps tk nn mt sa lb my bo tl mg as tt haw ln "
    "ha ba jw su").split()


@dataclass
class FullParams:
    """whisper_full_params analog (whisper.cpp:4688-4725)."""
    language: str = "en"
    translate: bool = False
    beam_size: int = 5
    best_of: int = 5
    temperatures: tuple = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0)
    logprob_thold: float = -1.0
    entropy_thold: float = 2.4
    no_timestamps: bool = True
    token_timestamps: bool = False       # DTW token-level times (dtw_aheads)
    max_tokens: int = 0                  # 0 = until eot / ctx limit
    seed: int = 0


@dataclass
class Segment:
    t0: float
    t1: float
    tokens: list
    text: str
    avg_logprob: float
    temperature: float
    token_times: list | None = None      # per-token seconds (DTW), optional


class WhisperPipeline:
    def __init__(self, cfg: W.WhisperConfig, params, filters=None,
                 vocab: list[bytes] | None = None, *,
                 compute_dtype=jnp.bfloat16):
        self.cfg = cfg
        self.params = params
        self.filters = filters
        self.vocab = vocab
        self.compute_dtype = compute_dtype

        def dec(params, toks, pos, cache, cross, n_past):
            return W.decode(cfg, params, toks, pos, cache, cross, n_past,
                            compute_dtype=compute_dtype)
        self._decode = jax.jit(dec, donate_argnums=(3,))

        def dec_topk(params, toks, pos, cache, cross, n_past, k):
            # beam-search fast path: log-softmax + special-token suppression
            # + per-beam top-k ON DEVICE, so each step fetches (beam, k)
            # floats instead of (beam, n_vocab) — the full-logits fetch is
            # ~1 MB/step over a tunneled link and dominated the end-to-end
            # RTF. Exact: any global top-k candidate is inside its own
            # beam's top-k.
            logits, cache = W.decode(cfg, params, toks, pos, cache, cross,
                                     n_past, compute_dtype=compute_dtype)
            lp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), -1)
            ids = jax.lax.iota(jnp.int32, lp.shape[-1])
            sup = (ids >= cfg.token_sot) & (ids != cfg.token_eot)
            lp = jnp.where(sup[None], -jnp.inf, lp)
            vals, idx = jax.lax.top_k(lp, k)
            return vals, idx, cache
        self._decode_topk = jax.jit(dec_topk, donate_argnums=(3,),
                                    static_argnames=("k",))
        self._encode = jax.jit(lambda p, mel: W.encode(
            cfg, p, mel, compute_dtype=compute_dtype))
        self._cross = jax.jit(lambda p, enc: W.precompute_cross_kv(
            cfg, p, enc, compute_dtype=compute_dtype))

    # -- prompt ------------------------------------------------------------
    def initial_tokens(self, fp: FullParams) -> list[int]:
        cfg = self.cfg
        toks = [cfg.token_sot]
        if cfg.is_multilingual:
            toks.append(cfg.token_sot + 1 + LANGUAGES.index(fp.language))
            toks.append(cfg.token_translate if fp.translate
                        else cfg.token_transcribe)
        if fp.no_timestamps:
            toks.append(cfg.token_not)
        return toks

    def detect_language(self, samples: np.ndarray) -> str:
        """whisper_lang_auto_detect analog: encode 30 s, decode one step
        from [sot], read the distribution over language tokens."""
        cfg = self.cfg
        if not cfg.is_multilingual:
            return "en"
        cross = self._encode_window(samples, 0)
        cache = W.init_cache(cfg, batch=1, dtype=self.compute_dtype)
        toks = jnp.asarray([[cfg.token_sot]], jnp.int32)
        pos = jnp.zeros((1, 1), jnp.int32)
        logits, _ = self._decode(self.params, toks, pos, cache, cross, 0)
        lang_ids = np.arange(len(LANGUAGES)) + cfg.token_sot + 1
        probs = np.asarray(logits)[0, 0, lang_ids]
        return LANGUAGES[int(np.argmax(probs))]

    # -- decoding ----------------------------------------------------------
    def _encode_window(self, samples, seek):
        mel = log_mel_spectrogram(samples[seek:seek + N_SAMPLES],
                                  self.filters)
        mel = mel[None, :, :2 * self.cfg.n_audio_ctx]
        enc = self._encode(self.params, mel.astype(jnp.float32))
        return self._cross(self.params, enc)

    def _run_beam(self, cross, prompt, fp: FullParams, temperature: float,
                  rng: np.random.Generator):
        """One decoding attempt at one temperature. Returns
        (tokens, avg_logprob, entropy)."""
        cfg = self.cfg
        beam = fp.beam_size if temperature == 0.0 else 1
        n_ctx = cfg.n_text_ctx
        max_new = fp.max_tokens or (n_ctx // 2 - len(prompt))

        cache = W.init_cache(cfg, batch=beam, dtype=self.compute_dtype)
        xk, xv = cross
        cross_b = (jnp.repeat(xk, beam, axis=1), jnp.repeat(xv, beam, axis=1))

        toks = np.tile(np.asarray(prompt, np.int32)[None], (beam, 1))
        pos = np.tile(np.arange(len(prompt), dtype=np.int32)[None], (beam, 1))
        use_topk = temperature == 0.0
        K2 = 2 * beam
        if use_topk:
            vals, idx, cache = self._decode_topk(
                self.params, jnp.asarray(toks), jnp.asarray(pos), cache,
                cross_b, 0, k=K2)
            vals_h, idx_h = np.asarray(vals), np.asarray(idx)  # (beam, 2b)
        else:
            logits, cache = self._decode(self.params, jnp.asarray(toks),
                                         jnp.asarray(pos), cache, cross_b, 0)
            logp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32),
                                      axis=-1)

        sum_lp = np.zeros(beam)
        sum_lp[1:] = -1e9                       # beams start identical
        seqs = [list() for _ in range(beam)]
        finished: list[tuple[float, list, float]] = []
        n_past = len(prompt)

        for step in range(max_new):
            if temperature > 0.0:
                lp = np.array(logp)             # (beam, V), writable copy
                # suppress special tokens except EOT mid-sequence
                # (whisper.cpp logits filtering, :5062-5123 simplified)
                sup = min(cfg.token_sot, cfg.n_vocab)
                special = np.arange(sup, cfg.n_vocab)
                lp[:, special[special != cfg.token_eot]] = -np.inf
                nxt = []
                for b in range(beam):
                    p = np.exp((lp[b] - lp[b].max()) / temperature)
                    p /= p.sum()
                    nxt.append(int(rng.choice(cfg.n_vocab, p=p)))
                order = list(range(beam))
                new_lp = [sum_lp[b] + lp[b, nxt[b]] for b in range(beam)]
            else:
                # suppression + top-2b ran on device: rank the (beam, 2b)
                # candidate grid — identical to ranking the full (beam, V)
                # matrix because any global top-2b entry is in its own
                # beam's top-2b
                cand = sum_lp[:, None] + vals_h        # (beam, 2b)
                flat = np.argsort(cand.ravel())[::-1][:K2]
                order, nxt, new_lp = [], [], []
                for f in flat:
                    b, j = divmod(int(f), K2)
                    t = int(idx_h[b, j])
                    if t == cfg.token_eot:
                        n_tok = len(seqs[b])
                        if n_tok > 0:
                            finished.append((cand[b, j] / (n_tok + 1),
                                             list(seqs[b]),
                                             cand[b, j]))
                        continue
                    order.append(b)
                    nxt.append(t)
                    new_lp.append(cand[b, j])
                    if len(order) == beam:
                        break
                while len(order) < beam:        # degenerate: pad with best
                    order.append(order[0] if order else 0)
                    nxt.append(int(idx_h[order[-1], 0]))
                    new_lp.append(-1e9)

            seqs = [seqs[b] + [t] for b, t in zip(order, nxt)]
            sum_lp = np.asarray(new_lp)
            if len(finished) >= beam:
                break

            # reorder the KV cache to follow surviving beams (device gather)
            if order != list(range(beam)):
                bsel = jnp.asarray(order)
                cache = cache.select_batch(bsel)
            tok_step = jnp.asarray(np.asarray(nxt, np.int32)[:, None])
            pos_step = jnp.full((beam, 1), n_past, jnp.int32)
            if use_topk:
                vals, idx, cache = self._decode_topk(
                    self.params, tok_step, pos_step, cache, cross_b, n_past,
                    k=K2)
                vals_h, idx_h = np.asarray(vals), np.asarray(idx)
            else:
                logits, cache = self._decode(self.params, tok_step, pos_step,
                                             cache, cross_b, n_past)
                logp = jax.nn.log_softmax(logits[:, 0].astype(jnp.float32),
                                          -1)
            n_past += 1
            if n_past >= n_ctx - 1:
                break

        if not finished:
            b = int(np.argmax(sum_lp))
            finished.append((sum_lp[b] / max(1, len(seqs[b])), seqs[b],
                             sum_lp[b]))
        finished.sort(key=lambda x: -x[0])
        avg_lp, tokens, _ = finished[0]
        return tokens, float(avg_lp), _token_entropy(tokens)

    def transcribe(self, samples: np.ndarray, fp: FullParams | None = None
                   ) -> list[Segment]:
        """whisper_full analog. Returns the list of segments."""
        fp = fp or FullParams()
        rng = np.random.default_rng(fp.seed)
        prompt = self.initial_tokens(fp)
        segments: list[Segment] = []
        n = len(samples)
        seek = 0
        while seek == 0 or seek + SAMPLE_RATE <= n:   # skip sub-second tails
            cross = self._encode_window(samples, seek)
            tokens, avg_lp, ent = [], -1e9, 0.0
            used_t = fp.temperatures[-1]
            for t in fp.temperatures:
                tokens, avg_lp, ent = self._run_beam(cross, prompt, fp, t, rng)
                used_t = t
                # QC gates (whisper.cpp:802-803, params :4716-4719)
                if avg_lp >= fp.logprob_thold and ent <= fp.entropy_thold:
                    break
            text = self.decode_text(tokens)
            tt = None
            if fp.token_timestamps and tokens:
                full = token_timestamps(self, cross, prompt + tokens,
                                        t_offset=seek / SAMPLE_RATE)
                tt = list(full[len(prompt):])
            segments.append(Segment(
                t0=seek / SAMPLE_RATE,
                t1=min(n, seek + N_SAMPLES) / SAMPLE_RATE,
                tokens=tokens, text=text, avg_logprob=avg_lp,
                temperature=used_t, token_times=tt))
            seek += N_SAMPLES
        return segments

    def transcribe_parallel(self, samples: np.ndarray,
                            fp: FullParams | None = None,
                            n_processors: int = 2) -> list[Segment]:
        """whisper_full_parallel analog (/root/reference whisper.h: split the
        audio into n_processors equal spans, decode each independently, merge
        segments in order with offset timestamps). The reference runs one
        thread + state per processor; here each span reuses the same compiled
        encode/decode executables and XLA's async dispatch overlaps the
        spans' device work, so no extra state or threads are needed."""
        if n_processors <= 1:
            return self.transcribe(samples, fp)
        n = len(samples)
        # span boundaries on whole seconds (the reference offsets processors
        # by whole 10ms frames; seconds keep mel-window alignment simple)
        per = max(SAMPLE_RATE, (n // n_processors // SAMPLE_RATE) * SAMPLE_RATE)
        spans = []
        start = 0
        while start < n and len(spans) < n_processors - 1:
            spans.append((start, min(n, start + per)))
            start += per
        if start < n:
            spans.append((start, n))
        out: list[Segment] = []
        for s0, s1 in spans:
            off = s0 / SAMPLE_RATE
            for seg in self.transcribe(samples[s0:s1], fp):
                seg.t0 += off
                seg.t1 += off
                if seg.token_times is not None:
                    seg.token_times = [t + off for t in seg.token_times]
                out.append(seg)
        return out

    def decode_text(self, tokens) -> str:
        if self.vocab is None:
            return ""
        out = b"".join(self.vocab[t] for t in tokens
                       if t < self.cfg.token_eot)
        return out.decode("utf-8", errors="replace")


def _token_entropy(tokens) -> float:
    """Degenerate-repetition signal: Shannon entropy over token repeat
    counts (whisper.cpp whisper_sequence entropy, :752-756). Low entropy =
    the decoder is looping."""
    if not tokens:
        return 0.0
    _, counts = np.unique(np.asarray(tokens), return_counts=True)
    p = counts / counts.sum()
    return float(-(p * np.log(p)).sum())


# ---- DTW token timestamps (whisper.cpp:355-378 / whisper_exp_compute_token
# _level_timestamps_dtw) ----

def _median_filter(w: np.ndarray, width: int = 7) -> np.ndarray:
    """Median filter along the last (audio) axis, edge-padded — the
    smoothing whisper applies to alignment attention before DTW."""
    pad = width // 2
    wp = np.pad(w, [(0, 0)] * (w.ndim - 1) + [(pad, pad)], mode="edge")
    stack = np.stack([wp[..., i:i + w.shape[-1]] for i in range(width)], -1)
    return np.median(stack, axis=-1)


def _dtw_path(cost: np.ndarray) -> np.ndarray:
    """Monotonic DTW over cost (T_text, T_audio); returns for each text row
    the matched audio column (backtraced path, first visit per row)."""
    n, m = cost.shape
    D = np.full((n + 1, m + 1), np.inf, np.float64)
    D[0, 0] = 0.0
    for i in range(1, n + 1):
        row_prev = D[i - 1]
        row = D[i]
        for j in range(1, m + 1):
            row[j] = cost[i - 1, j - 1] + min(row_prev[j - 1], row_prev[j],
                                              row[j - 1])
    # backtrace
    i, j = n, m
    match = np.zeros(n, np.int64)
    while i > 0:
        match[i - 1] = j - 1
        moves = (D[i - 1, j - 1], D[i - 1, j], D[i, j - 1])
        a = int(np.argmin(moves))
        if a == 0:
            i, j = i - 1, j - 1
        elif a == 1:
            i = i - 1
        else:
            j = j - 1
            if j == 0:
                j = 1
    return match


def token_timestamps(pipe: "WhisperPipeline", cross, tokens: list, *,
                     alignment_heads=None, t_offset: float = 0.0):
    """DTW token-level timestamps for one decoded segment.

    cross: cross-KV of the segment's audio window; tokens: the full token
    sequence (prompt + text). Runs ONE teacher-forced decode pass with
    return_cross_attn, selects alignment heads (default: all heads of the
    top half of the text layers, whisper.cpp's preset-less fallback),
    median-filters, normalizes, and DTW-aligns. Returns seconds per token
    (len == len(tokens)); each audio column is 20 ms (2 mel frames)."""
    from ..models import whisper as W
    import jax.numpy as jnp

    cfg = pipe.cfg
    cache = W.init_cache(cfg, batch=1, dtype=pipe.compute_dtype)
    toks = jnp.asarray(np.asarray(tokens, np.int32)[None])
    pos = jnp.asarray(np.arange(len(tokens), dtype=np.int32)[None])
    _, _, probs = W.decode(cfg, pipe.params, toks, pos, cache, cross, 0,
                           compute_dtype=pipe.compute_dtype,
                           return_cross_attn=True)
    probs = np.asarray(probs)                 # (L, 1, H, T, T_audio)
    L, _, H, T, TA = probs.shape
    if alignment_heads is None:
        alignment_heads = [(l, h) for l in range(L // 2, L) for h in range(H)]
    w = np.stack([probs[l, 0, h] for l, h in alignment_heads])  # (A, T, TA)
    w = _median_filter(w)
    std = w.std(axis=-1, keepdims=True)
    w = (w - w.mean(axis=-1, keepdims=True)) / np.where(std > 0, std, 1.0)
    cost = -w.mean(axis=0)                    # (T, TA)
    match = _dtw_path(cost)
    return t_offset + match.astype(np.float64) * 0.02
