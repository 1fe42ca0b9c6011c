"""Continuous batching over a celled KV cache.

Reference semantics (gpt-2/main-batched.cpp — SURVEY.md §A.3): the KV cache
is a pool of n_ctx cells, each tagged {pos, set<seq_id>}; a decode step
writes batch rows at cells[head+i] tagged with (pos, seq); the attention
mask admits cell c for token t iff `c.has_seq_id(t.seq) && c.pos <= t.pos`
(:931); sequence fork is O(1) — `kv_cache_seq_cp` just inserts the new
seq_id into the prefix's cells (:826-841).

TPU-native: cell metadata (pos i32, seq-bitmask u32) lives in two tiny
device arrays rebuilt from host bookkeeping each step; K/V rows scatter to
their cells inside the jitted step (models' `cells=` path); the mask is
computed on device from the metadata (models/common.cells_attention_mask).
Token counts are bucketed so XLA compiles a handful of step shapes, and the
cache buffer is donated — ggml's "allocate once, overwrite forever" arena
contract under static shapes.

Up to 32 concurrent sequences (u32 bitmask); the reference's n_seq_max is a
parameter with the same role (whisper_batch_init, main-batched.cpp:450).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models.common import cells_attention_mask
from ..ops.sampling import sample_greedy, sample_host

MAX_SEQ = 32
_BUCKETS = (8, 16, 32, 64, 128, 256, 512)


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return n


@dataclass
class Request:
    seq: int
    prompt: list
    n_predict: int
    top_k: int = 40
    top_p: float = 0.9
    temp: float = 0.8
    eos_id: int | None = None
    out: list = field(default_factory=list)
    pos: int = 0                     # next position to fill
    n_prompt_done: int = 0
    done: bool = False
    rng: np.random.Generator = field(default_factory=np.random.default_rng)
    logits: np.ndarray | None = None
    next_tok: int | None = None


class BatchedEngine:
    """Continuous-batching server loop over any model exposing the
    `forward(..., cells=, mask=)` interface (gpt2/gptj/llama)."""

    def __init__(self, model_module, cfg, params, *, n_ctx: int | None = None,
                 compute_dtype=jnp.bfloat16, kv_dtype=jnp.bfloat16,
                 on_device_sampling: bool = False, top_k: int = 40,
                 top_p: float = 0.9, seed: int = 0, n_ubatch: int = 512,
                 stacked: bool = False):
        """on_device_sampling: sample inside the jitted step with PER-REQUEST
        temperature/top_k/top_p (a (3, nb) param row per token, matching the
        reference's per-request sampler params, common.h:114-132) and return
        only token ids — the host never fetches logits. Essential over slow
        host<->device links. top_k here only sets the default k_max window
        (traced per-row k is a rank mask inside a static top-k of
        max(64, top_k))."""
        self.model = model_module
        self.cfg = cfg
        if stacked:
            # scan-over-layers celled decode: ONE compiled layer body per
            # ubatch bucket instead of n_layer inlined copies — the serving
            # analog of Engine(residency="q4-stacked"). KV writes go through
            # update_kv_cells inside the scan; attention stays on the XLA
            # path (cell masks need the full (T, n_ctx) mask form).
            from ..ops.pallas_qmm import params_repack_device
            if hasattr(model_module, "prepare_fused"):
                params = model_module.prepare_fused(params, cfg)
            params = params_repack_device(params)
            params = model_module.stack_model(params)
        self._stacked = stacked
        self.params = params
        self.n_ctx = n_ctx or cfg.n_ctx
        self.kv_dtype = kv_dtype
        # max tokens per ubatch (the reference's n_batch, common.h:26):
        # long prompts prefill across several steps instead of compiling
        # one giant bucket, and decode rows keep joining each ubatch
        self.n_ubatch = n_ubatch
        self.on_device_sampling = on_device_sampling
        self._key = jax.random.key(seed)
        self._step_no = 0

        # host-side cell registry (main-batched.cpp:80-117). The LAST cell
        # is reserved as the trash destination for ubatch pad rows (both
        # the scatter path and the fused cells kernel write pads there;
        # its metadata stays empty so it is never visible).
        self.cell_pos = np.full(self.n_ctx, -1, np.int32)
        self.cell_seq = np.zeros(self.n_ctx, np.uint32)
        self.trash_cell = self.n_ctx - 1
        self.head = 0
        self.requests: dict[int, Request] = {}
        self._next_seq = 0
        import inspect
        sig_ic = inspect.signature(model_module.init_cache).parameters
        if "flat" in sig_ic:
            self.cache = model_module.init_cache(
                cfg, batch=1, n_ctx=self.n_ctx, dtype=kv_dtype,
                flat=self._stacked)
        else:
            assert not self._stacked, \
                f"{model_module.__name__} has no flat-cache layout"
            self.cache = model_module.init_cache(
                cfg, batch=1, n_ctx=self.n_ctx, dtype=kv_dtype)
        has_ck = "cells_kernel" in \
            inspect.signature(model_module.forward).parameters

        def step(params, tokens, positions, seqs, cells, cell_pos, cell_seq,
                 cache, ck=False):
            mask = cells_attention_mask(positions, seqs, cell_pos, cell_seq)
            kw = {"cells_kernel": ck} if has_ck else {}
            return model_module.forward(
                cfg, params, tokens, positions, cache, 0,
                compute_dtype=compute_dtype, cells=cells, mask=mask, **kw)
        self._step = jax.jit(step, donate_argnums=(7,),
                             static_argnames=("ck",))

        def step_sampled(params, packed, samp, cache, key, nb, ck=False):
            # packed: ONE int32 upload [tokens|positions|seqs|cells|
            # cell_pos|cell_seq] — a single host->device transfer per step
            # (each separate small upload costs a full round trip on
            # tunneled runtimes). samp: (3, nb) f32 per-ROW sampling params
            # [temp; top_k; top_p] — per-request sampling like the
            # reference's batched loop (common.h:114-132), not engine-wide.
            from ..ops.sampling import sample_device
            tokens = packed[0:nb][None]
            positions = packed[nb:2 * nb][None]
            seqs = packed[2 * nb:3 * nb][None]
            cells = packed[3 * nb:4 * nb][None]
            cell_pos = packed[4 * nb:4 * nb + self.n_ctx][None]
            cell_seq = packed[4 * nb + self.n_ctx:
                              4 * nb + 2 * self.n_ctx].astype(jnp.uint32)[None]
            logits, cache = step(params, tokens, positions, seqs, cells,
                                 cell_pos, cell_seq, cache, ck)
            lg = logits[0].astype(jnp.float32)             # (nb, V)
            temps, kks, pps = samp[0], samp[1], samp[2]
            greedy = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            drawn = sample_device(lg, key,
                                  top_k=kks.astype(jnp.int32)[:, None],
                                  top_p=pps[:, None],
                                  temp=jnp.maximum(temps, 1e-6)[:, None],
                                  k_max=self._k_max)
            return jnp.where(temps <= 0, greedy, drawn), cache
        self._k_max = max(64, top_k)
        self._step_sampled = jax.jit(step_sampled, donate_argnums=(3,),
                                     static_argnames=("nb", "ck"))

        def chunk_scan(params, tok, pos0, seqs, cells_k, cell_pos, cell_seq,
                       samp, cache, key, nsteps, ck):
            # nsteps decode steps in ONE dispatch: lax.scan over steps with
            # per-request on-device sampling. The cell metadata for ALL
            # nsteps cells is pre-registered — safe because the mask admits
            # a cell only when cell.pos <= token.pos (main-batched.cpp:931),
            # so step i cannot see the cells steps >i will write.
            from ..ops.sampling import sample_device
            temps, kks, pps = samp[0], samp[1], samp[2]

            def body(carry, xs):
                tok, cache = carry
                cells_row, i = xs
                positions = (pos0 + i)[None]
                mask = cells_attention_mask(positions, seqs, cell_pos,
                                            cell_seq)
                kw = {"cells_kernel": ck} if has_ck else {}
                logits, cache = model_module.forward(
                    cfg, params, tok[None], positions, cache, 0,
                    compute_dtype=compute_dtype, cells=cells_row[None],
                    mask=mask, **kw)
                lg = logits[0].astype(jnp.float32)
                greedy = jnp.argmax(lg, axis=-1).astype(jnp.int32)
                drawn = sample_device(
                    lg, jax.random.fold_in(key, i),
                    top_k=kks.astype(jnp.int32)[:, None],
                    top_p=pps[:, None],
                    temp=jnp.maximum(temps, 1e-6)[:, None],
                    k_max=self._k_max)
                nxt = jnp.where(temps <= 0, greedy, drawn)
                return (nxt, cache), nxt

            (_, cache), toks = jax.lax.scan(
                body, (tok, cache), (cells_k, jnp.arange(nsteps)))
            return toks, cache

        def step_sampled_chunk(params, packed, samp, cache, key, nsteps, nb,
                               ck=False):
            # packed: ONE int32 upload [tok0|pos0|seqs|cells(nsteps*nb)|
            # cell_pos|cell_seq] — a single host->device transfer per chunk
            tok = packed[0:nb]
            pos0 = packed[nb:2 * nb]
            seqs = packed[2 * nb:3 * nb][None]
            cells_k = packed[3 * nb:(3 + nsteps) * nb].reshape(nsteps, nb)
            off = (3 + nsteps) * nb
            cell_pos = packed[off:off + self.n_ctx][None]
            cell_seq = packed[off + self.n_ctx:
                              off + 2 * self.n_ctx].astype(jnp.uint32)[None]
            return chunk_scan(params, tok, pos0, seqs, cells_k, cell_pos,
                              cell_seq, samp, cache, key, nsteps, ck)
        self._step_sampled_chunk = jax.jit(
            step_sampled_chunk, donate_argnums=(3,),
            static_argnames=("nsteps", "nb", "ck"))

        def step_sampled_chunk_carry(params, packed, tok, samp, cache, key,
                                     nsteps, nb, ck=False):
            # the double-buffered variant: tok is a DEVICE-resident carry
            # (the previous chunk's last sampled row, toks_out[-1]) so the
            # next chunk dispatches without any host fetch of the previous
            # chunk's tokens — the fetch then overlaps this chunk's device
            # execution (run_pipelined). packed: [pos0|seqs|cells(nsteps*nb)|
            # cell_pos|cell_seq].
            pos0 = packed[0:nb]
            seqs = packed[nb:2 * nb][None]
            cells_k = packed[2 * nb:(2 + nsteps) * nb].reshape(nsteps, nb)
            off = (2 + nsteps) * nb
            cell_pos = packed[off:off + self.n_ctx][None]
            cell_seq = packed[off + self.n_ctx:
                              off + 2 * self.n_ctx].astype(jnp.uint32)[None]
            return chunk_scan(params, tok, pos0, seqs, cells_k, cell_pos,
                              cell_seq, samp, cache, key, nsteps, ck)
        self._step_sampled_chunk_carry = jax.jit(
            step_sampled_chunk_carry, donate_argnums=(4,),
            static_argnames=("nsteps", "nb", "ck"))

    # -- cell registry ------------------------------------------------------
    def _find_slot(self, n: int) -> int:
        """Head-cursor slot allocator (the reference keeps a head cursor
        bumped per ubatch, main-batched.cpp:976-981). Common case — the
        run ahead of the cursor is free — is an O(n) check + bump; only
        on collision (wraparound into still-live cells) does it fall back
        to one vectorized first-fit scan, preferring runs at/after the
        cursor so allocation keeps rolling forward."""
        nc = self.trash_cell               # usable cells: [0, trash_cell)
        if n > nc:
            raise RuntimeError("KV cache full")
        h = self.head
        if h + n <= nc and not (self.cell_pos[h:h + n] >= 0).any():
            self.head = h + n
            return h
        free = (self.cell_pos[:nc] < 0).astype(np.int32)
        c = np.concatenate([[0], np.cumsum(free)])
        hits = np.flatnonzero(c[n:] - c[:-n] == n)
        if hits.size == 0:
            raise RuntimeError("KV cache full")
        after = hits[hits >= h]
        base = int(after[0]) if after.size else int(hits[0])
        self.head = base + n
        return base

    def seq_cp(self, src_seq: int, dst_seq: int, p0: int = 0,
               p1: int | None = None):
        """O(1) logical fork (kv_cache_seq_cp, main-batched.cpp:826-841):
        tag the source cells with the destination seq id too."""
        sel = ((self.cell_seq >> np.uint32(src_seq)) & 1).astype(bool)
        sel &= self.cell_pos >= p0
        if p1 is not None:
            sel &= self.cell_pos < p1
        self.cell_seq[sel] |= np.uint32(1 << dst_seq)

    def seq_rm(self, seq: int):
        """Remove a sequence's tag; free cells that belong to nobody."""
        self.cell_seq &= ~np.uint32(1 << seq)
        self.cell_pos[self.cell_seq == 0] = -1

    # -- requests -------------------------------------------------------------
    def add_request(self, prompt_tokens, n_predict: int, *, seed: int = 0,
                    top_k: int = 40, top_p: float = 0.9, temp: float = 0.8,
                    eos_id: int | None = None) -> int:
        # seq id MAX_SEQ-1 is reserved for padding rows; ids of finished
        # requests are recycled (their cells were freed by seq_rm)
        used = {r.seq for r in self.requests.values() if not r.done}
        if len(used) >= MAX_SEQ - 1:
            raise RuntimeError(f"max {MAX_SEQ - 1} concurrent sequences")
        seq = next(s for s in range(MAX_SEQ - 1) if s not in used)
        rid = self._next_seq
        self._next_seq += 1
        if self.on_device_sampling and top_k > self._k_max \
                and not getattr(self, "_warned_k", False):
            import warnings
            warnings.warn(
                f"on-device sampling clamps top_k to the static candidate "
                f"window ({self._k_max}); construct the engine with "
                f"top_k={top_k} to widen it", stacklevel=2)
            self._warned_k = True
        self.requests[rid] = Request(
            seq=seq, prompt=list(map(int, prompt_tokens)),
            n_predict=n_predict, top_k=top_k, top_p=top_p, temp=temp,
            eos_id=eos_id, rng=np.random.default_rng(seed))
        return rid

    def fork(self, rid: int, *, seed: int = 1) -> int:
        """Fork a (fully prefilled) request into a new sequence sharing the
        prefix cells — the n_parallel fan-out of main-batched.cpp:1080."""
        src = self.requests[rid]
        new = self.add_request([], src.n_predict, top_k=src.top_k,
                               top_p=src.top_p, temp=src.temp,
                               eos_id=src.eos_id, seed=seed)
        r = self.requests[new]
        r.pos = src.pos
        r.n_prompt_done = len(src.prompt)
        r.prompt = src.prompt
        r.logits = None if src.logits is None else src.logits.copy()
        r.next_tok = src.next_tok          # device-sampling mode fork
        self.seq_cp(src.seq, r.seq)
        return new

    # -- the step -------------------------------------------------------------
    def step(self) -> bool:
        """Assemble a ubatch (prompt chunks + one decode token per live seq),
        run it, sample. Returns False when all requests are done."""
        toks, poss, seqs, cells = [], [], [], []
        sample_rows: list[tuple[Request, int]] = []
        mixed = False                      # True if any prompt chunk joined

        for r in self.requests.values():
            if r.done:
                continue
            if r.n_prompt_done < len(r.prompt):
                room = self.n_ubatch - len(toks)
                if room <= 0:
                    continue
                chunk = r.prompt[r.n_prompt_done:r.n_prompt_done + room]
                base = self._find_slot(len(chunk))
                for i, t in enumerate(chunk):
                    self.cell_pos[base + i] = r.pos
                    self.cell_seq[base + i] = np.uint32(1 << r.seq)
                    toks.append(t)
                    poss.append(r.pos)
                    seqs.append(r.seq)
                    cells.append(base + i)
                    r.pos += 1
                r.n_prompt_done += len(chunk)
                mixed = True
                if r.n_prompt_done == len(r.prompt):
                    # prompt complete in this ubatch -> its last row samples
                    sample_rows.append((r, len(toks) - 1))
            else:
                if len(toks) >= self.n_ubatch:
                    continue                 # ubatch full; decode next step
                if r.logits is None and getattr(r, "next_tok", None) is None:
                    r.done = True
                    continue
                tok = self._sample(r)
                assert tok is not None, (
                    "request has neither logits nor next_tok at decode",
                    r.seq, r.n_prompt_done, len(r.out))
                r.out.append(tok)
                if ((r.eos_id is not None and tok == r.eos_id)
                        or len(r.out) >= r.n_predict or r.pos >= self.n_ctx - 1):
                    r.done = True
                    self.seq_rm(r.seq)
                    continue
                cell = self._find_slot(1)
                self.cell_pos[cell] = r.pos
                self.cell_seq[cell] = np.uint32(1 << r.seq)
                toks.append(tok)
                poss.append(r.pos)
                seqs.append(r.seq)
                cells.append(cell)
                r.pos += 1
                sample_rows.append((r, len(toks) - 1))

        if not toks:
            return any(not r.done for r in self.requests.values())

        n = len(toks)
        nb = min(_bucket(n), self.n_ctx)
        pad = nb - n

        def arr(v, fill, dt):
            return jnp.asarray(np.pad(np.asarray(v, dt), (0, pad),
                                      constant_values=fill)[None])
        tokens = arr(toks, 0, np.int32)
        positions = arr(poss, 0, np.int32)
        # pad rows: reserved seq id (never allocated) -> fully-masked
        # attention; their K/V rows land in the reserved trash cell, whose
        # metadata is never set, so they are invisible to every sequence
        seq_arr = arr(seqs, MAX_SEQ - 1, np.int32)
        cells_arr = arr(cells, self.trash_cell, np.int32)

        if self.on_device_sampling:
            samp = np.zeros((3, nb), np.float32)
            samp[1] = 40.0
            samp[2] = 0.9
            for r, row in sample_rows:
                samp[0, row] = max(0.0, r.temp)
                # llama.cpp semantics: top_k <= 0 disables the filter — on
                # device that means the full static candidate window; larger
                # requests clamp to it (warned once at add_request)
                samp[1, row] = self._k_max if r.top_k <= 0 \
                    else min(r.top_k, self._k_max)
                samp[2, row] = r.top_p
            self._step_no += 1
            key = jax.random.fold_in(self._key, self._step_no)
            packed = np.concatenate([
                np.pad(np.asarray(toks, np.int32), (0, pad)),
                np.pad(np.asarray(poss, np.int32), (0, pad)),
                np.pad(np.asarray(seqs, np.int32), (0, pad),
                       constant_values=MAX_SEQ - 1),
                np.pad(np.asarray(cells, np.int32), (0, pad),
                       constant_values=self.trash_cell),
                self.cell_pos.astype(np.int32),
                self.cell_seq.view(np.int32),
            ])
            toks_out, self.cache = self._step_sampled(
                self.params, jnp.asarray(packed), jnp.asarray(samp),
                self.cache, key, nb=nb, ck=self._stacked and not mixed)
            ids = np.asarray(toks_out)                 # (nb,) int32 — tiny
            for r, row in sample_rows:
                r.next_tok = int(ids[row])
        else:
            logits, self.cache = self._step(
                self.params, tokens, positions, seq_arr, cells_arr,
                jnp.asarray(self.cell_pos[None]),
                jnp.asarray(self.cell_seq[None]), self.cache,
                ck=self._stacked and not mixed)
            lg = np.asarray(logits[0])
            for r, row in sample_rows:
                r.logits = lg[row]
        return any(not r.done for r in self.requests.values())

    def step_chunk(self, k: int) -> bool:
        """Run up to k decode steps in ONE device dispatch (lax.scan over
        steps, per-request sampling on device), then reconcile EOS/limits
        on the host. Semantics match k calls to step() for a pure-decode
        ubatch; falls back to step() whenever any live request is still
        prefilling (or on-device sampling is off), so callers can use it
        unconditionally as the serving loop body.

        Why: the reference's serving loop is host-driven per token
        (main-batched.cpp decode loop) — fine co-located, but each step
        pays a full host<->device round trip. Chunking amortizes that RTT
        k ways; tokens a request generates past its own EOS/n_predict
        inside a chunk are discarded and its cells freed with the seq."""
        if k <= 1 or not self.on_device_sampling:
            return self.step()
        live = [r for r in self.requests.values() if not r.done]
        if not live:
            return False
        if any(r.n_prompt_done < len(r.prompt) or
               (r.next_tok is None and r.logits is None) for r in live):
            return self.step()          # mixed/prefill ubatch: single step
        k = min([k] + [self.n_ctx - 1 - r.pos for r in live])
        if k <= 1:
            return self.step()

        rows: list[Request] = []
        toks0, pos0, seqs, cells_rows = [], [], [], []
        for r in live:
            tok = self._sample(r)
            assert tok is not None, (
                "request has neither logits nor next_tok at chunk start",
                r.seq, r.n_prompt_done, len(r.out))
            r.out.append(tok)
            if ((r.eos_id is not None and tok == r.eos_id)
                    or len(r.out) >= r.n_predict
                    or r.pos >= self.n_ctx - 1):
                r.done = True
                self.seq_rm(r.seq)
                continue
            cl = []
            for i in range(k):
                c = self._find_slot(1)
                self.cell_pos[c] = r.pos + i
                self.cell_seq[c] = np.uint32(1 << r.seq)
                cl.append(c)
            rows.append(r)
            toks0.append(tok)
            pos0.append(r.pos)
            seqs.append(r.seq)
            cells_rows.append(cl)
            r.pos += k
        if not rows:
            return any(not r.done for r in self.requests.values())

        n = len(rows)
        nb = min(_bucket(n), self.n_ctx)
        pad = nb - n
        samp = np.zeros((3, nb), np.float32)
        samp[1] = 40.0
        samp[2] = 0.9
        for row, r in enumerate(rows):
            samp[0, row] = max(0.0, r.temp)
            samp[1, row] = self._k_max if r.top_k <= 0 \
                else min(r.top_k, self._k_max)
            samp[2, row] = r.top_p
        cells_k = np.full((k, nb), self.trash_cell, np.int32)
        for row, cl in enumerate(cells_rows):
            cells_k[:, row] = cl
        self._step_no += 1
        key = jax.random.fold_in(self._key, self._step_no)
        packed = np.concatenate([
            np.pad(np.asarray(toks0, np.int32), (0, pad)),
            np.pad(np.asarray(pos0, np.int32), (0, pad)),
            np.pad(np.asarray(seqs, np.int32), (0, pad),
                   constant_values=MAX_SEQ - 1),
            cells_k.reshape(-1),
            self.cell_pos.astype(np.int32),
            self.cell_seq.view(np.int32),
        ])
        toks_out, self.cache = self._step_sampled_chunk(
            self.params, jnp.asarray(packed), jnp.asarray(samp),
            self.cache, key, nsteps=k, nb=nb, ck=self._stacked)
        ids = np.asarray(toks_out)                       # (k, nb) int32
        self._step_no += k - 1                           # key-space parity
        for row, r in enumerate(rows):
            for i in range(k):
                tok = int(ids[i, row])
                if i == k - 1:
                    r.next_tok = tok     # sampled, not yet fed — the next
                    break                # step()/step_chunk consumes it
                r.out.append(tok)
                # ctx check per TOKEN: token i was sampled at pos0+i and
                # would be fed (written) at pos0+i+1 — NOT r.pos, which
                # already advanced past the whole chunk (a pos check here
                # discarded valid tail tokens whenever a chunk landed
                # exactly at the arena edge)
                if ((r.eos_id is not None and tok == r.eos_id)
                        or len(r.out) >= r.n_predict
                        or pos0[row] + i + 1 >= self.n_ctx - 1):
                    r.done = True
                    r.next_tok = None
                    self.seq_rm(r.seq)   # frees the unused chunk cells too
                    break
        return any(not r.done for r in self.requests.values())

    # -- double-buffered decode ----------------------------------------------
    def _dispatch_chunk(self, rows, tok, k: int):
        """Dispatch one k-step decode chunk for `rows` and return the
        (k, nb) device token array WITHOUT fetching it. `tok` is either a
        host list of first tokens (pipeline head) or a device (nb,) carry
        — the previous chunk's last sampled row — in which case NO token
        data crosses the host boundary at all. Registers the k cells per
        row and advances r.pos."""
        n = len(rows)
        nb = min(_bucket(n), self.n_ctx)
        pad = nb - n
        samp = np.zeros((3, nb), np.float32)
        samp[1] = 40.0
        samp[2] = 0.9
        for row, r in enumerate(rows):
            samp[0, row] = max(0.0, r.temp)
            samp[1, row] = self._k_max if r.top_k <= 0 \
                else min(r.top_k, self._k_max)
            samp[2, row] = r.top_p
        pos0 = [r.pos for r in rows]
        seqs = [r.seq for r in rows]
        cells_k = np.full((k, nb), self.trash_cell, np.int32)
        for row, r in enumerate(rows):
            for i in range(k):
                c = self._find_slot(1)
                self.cell_pos[c] = r.pos + i
                self.cell_seq[c] = np.uint32(1 << r.seq)
                cells_k[i, row] = c
            r.pos += k
        packed = np.concatenate([
            np.pad(np.asarray(pos0, np.int32), (0, pad)),
            np.pad(np.asarray(seqs, np.int32), (0, pad),
                   constant_values=MAX_SEQ - 1),
            cells_k.reshape(-1),
            self.cell_pos.astype(np.int32),
            self.cell_seq.view(np.int32),
        ])
        self._step_no += k
        key = jax.random.fold_in(self._key, self._step_no)
        if isinstance(tok, list):
            tok = jnp.asarray(np.pad(np.asarray(tok, np.int32), (0, pad)))
        toks_out, self.cache = self._step_sampled_chunk_carry(
            self.params, jnp.asarray(packed), tok, jnp.asarray(samp),
            self.cache, key, nsteps=k, nb=nb, ck=self._stacked)
        return toks_out

    def run_pipelined(self, k: int) -> dict[int, list]:
        """Drive every request to completion with DOUBLE-BUFFERED k-step
        chunks: chunk j+1 is dispatched from chunk j's device-resident
        token carry BEFORE chunk j's tokens are fetched, so the host
        fetch (a full tunnel round trip) and the EOS/limit bookkeeping
        overlap chunk j+1's device execution. step_chunk amortizes the
        round trip k ways; this removes it from the critical path
        entirely while all rows stay live (VERDICT r04 item 3b).

        Semantics match the step()/step_chunk loop for greedy sampling
        (temp<=0); stochastic rows draw from a different (still
        per-dispatch-unique) key schedule. A row that hits EOS while a
        successor chunk is in flight has the successor's tokens for it
        discarded — the same contract as step_chunk's past-EOS discard,
        extended one chunk. Falls back to step() for prefill/mixed
        ubatches, so callers can use it as the whole serving loop."""
        assert self.on_device_sampling, "run_pipelined needs device sampling"
        while any(not r.done for r in self.requests.values()):
            live = [r for r in self.requests.values() if not r.done]
            if any(r.n_prompt_done < len(r.prompt)
                   or (r.next_tok is None and r.logits is None)
                   for r in live):
                self.step()
                continue
            kk = min([k] + [self.n_ctx - 1 - r.pos for r in live])
            if kk <= 1:
                self.step()
                continue
            # pipeline head: consume each pending token on the host
            # (identical to step_chunk's chunk start)
            rows, toks0 = [], []
            for r in live:
                tok = self._sample(r)
                r.out.append(tok)
                if ((r.eos_id is not None and tok == r.eos_id)
                        or len(r.out) >= r.n_predict
                        or r.pos >= self.n_ctx - 1):
                    r.done = True
                    self.seq_rm(r.seq)
                    continue
                rows.append(r)
                toks0.append(tok)
            if not rows:
                continue
            starts = [r.pos for r in rows]     # chunk-start positions
            inflight = self._dispatch_chunk(rows, toks0, kk)
            pending_rm: list[Request] = []
            while True:
                # dispatch the successor IFF every row can absorb another
                # kk tokens past the in-flight chunk without crossing its
                # n_predict/ctx limit (EOS is the only mid-chunk stop the
                # host can't predict) and nobody went zombie last retire
                can_pipe = all(
                    not r.done
                    and len(r.out) + 2 * kk <= r.n_predict
                    and r.pos + kk <= self.n_ctx - 1 for r in rows)
                if can_pipe:
                    nstarts = [r.pos for r in rows]
                    nxt = self._dispatch_chunk(rows, inflight[kk - 1], kk)
                else:
                    nxt = None
                ids = np.asarray(inflight)      # (kk, nb); overlaps nxt
                for row, r in enumerate(rows):
                    if r.done:                  # zombie: discard the chunk
                        continue
                    for i in range(kk):
                        tok = int(ids[i, row])
                        if i == kk - 1 and nxt is None:
                            # pipeline drains: defer the last token exactly
                            # like step_chunk (sampled, not yet fed)
                            r.next_tok = tok
                            break
                        r.out.append(tok)
                        # ctx check per TOKEN (fed at starts[row]+i+1) —
                        # r.pos has already advanced past the in-flight
                        # chunks and fired spuriously at the arena edge,
                        # discarding up to 2k-1 valid tokens
                        if ((r.eos_id is not None and tok == r.eos_id)
                                or len(r.out) >= r.n_predict
                                or starts[row] + i + 1 >= self.n_ctx - 1):
                            r.done = True
                            r.next_tok = None
                            if nxt is None:
                                self.seq_rm(r.seq)
                            else:
                                pending_rm.append(r)  # cells still in use
                            break
                if nxt is None:
                    break                       # outer loop compacts rows
                inflight = nxt
                starts = nstarts
            for r in pending_rm:
                self.seq_rm(r.seq)
        return {rid: r.out for rid, r in self.requests.items()}

    def _sample(self, r: Request) -> int:
        if self.on_device_sampling:
            tok = r.next_tok
            r.next_tok = None
            return tok
        if r.temp <= 0:
            return sample_greedy(r.logits)
        return sample_host(r.logits, top_k=r.top_k, top_p=r.top_p,
                           temp=r.temp, rng=r.rng)

    def run(self) -> dict[int, list]:
        while self.step():
            pass
        return {s: r.out for s, r in self.requests.items()}
