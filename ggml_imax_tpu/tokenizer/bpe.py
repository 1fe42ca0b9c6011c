"""GPT-style tokenizers.

Two flavors, mirroring the reference:
- `GreedyBPETokenizer`: the examples' tokenizer (gpt_tokenize,
  /root/reference/examples/common.cpp:297-360): GPT-2 regex word split +
  greedy longest-substring matching against the vocab. This is what the
  gpt-2/gpt-j CLIs use with legacy .bin vocabs (no merge ranks available).
- `ByteLevelBPETokenizer`: proper byte-level merge-rank BPE for GGUF models
  that carry tokenizer.ggml.merges (HF-compatible encoding).

Both share the GPT-2 pre-tokenization regex and byte-level decode table.
"""
from __future__ import annotations

import regex as _regex  # available via transformers dependency

GPT2_SPLIT_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"
)
_SPLIT_RE = _regex.compile(GPT2_SPLIT_PATTERN)


def bytes_to_unicode() -> dict[int, str]:
    """GPT-2 byte <-> printable-unicode table (as in HF's gpt2 tokenizer)."""
    bs = (list(range(ord("!"), ord("~") + 1)) + list(range(0xA1, 0xAD))
          + list(range(0xAE, 0x100)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


_B2U = bytes_to_unicode()
_U2B = {v: k for k, v in _B2U.items()}


class GreedyBPETokenizer:
    """Vocab-only tokenizer used by the reference examples."""

    def __init__(self, vocab: list[bytes] | list[str], special_tokens=()):
        self.id_to_token = [t.decode("utf-8", errors="replace") if isinstance(t, bytes) else t
                            for t in vocab]
        self.token_to_id = {t: i for i, t in enumerate(self.id_to_token)}
        self.special_tokens = list(special_tokens)

    def encode(self, text: str) -> list[int]:
        words: list[str] = []
        if self.special_tokens:
            pat = _regex.compile("|".join(_regex.escape(t) for t in self.special_tokens))
            pos = 0
            for m in pat.finditer(text):
                words.extend(w.group(0) for w in _SPLIT_RE.finditer(text[pos:m.start()]))
                words.append(m.group(0))
                pos = m.end()
            text = text[pos:]
        words.extend(w.group(0) for w in _SPLIT_RE.finditer(text))

        tokens: list[int] = []
        for word in words:
            i = 0
            while i < len(word):
                for j in range(len(word) - 1, i - 1, -1):
                    cand = word[i:j + 1]
                    tid = self.token_to_id.get(cand)
                    if tid is not None:
                        tokens.append(tid)
                        i = j + 1
                        break
                    if j == i:  # no single-char match: skip (reference warns)
                        i += 1
        return tokens

    def decode(self, ids) -> str:
        return "".join(self.id_to_token[int(i)] for i in ids)


class ByteLevelBPETokenizer:
    """Merge-rank byte-level BPE (GPT-2/HF-compatible), for GGUF vocabs."""

    def __init__(self, vocab: list[str], merges: list[str], special_tokens=()):
        self.id_to_token = list(vocab)
        self.token_to_id = {t: i for i, t in enumerate(vocab)}
        self.ranks = {}
        for r, m in enumerate(merges):
            a, b = m.split(" ", 1)
            self.ranks[(a, b)] = r
        self.special_tokens = {t: self.token_to_id[t] for t in special_tokens
                               if t in self.token_to_id}

    def _bpe_word(self, word: str) -> list[str]:
        parts = list(word)
        while len(parts) > 1:
            best, best_rank = None, None
            for i in range(len(parts) - 1):
                r = self.ranks.get((parts[i], parts[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            parts[best:best + 2] = [parts[best] + parts[best + 1]]
        return parts

    def encode(self, text: str) -> list[int]:
        out: list[int] = []
        segments = [(text, False)]
        if self.special_tokens:
            pat = _regex.compile("|".join(_regex.escape(t) for t in self.special_tokens))
            segments = []
            pos = 0
            for m in pat.finditer(text):
                if m.start() > pos:
                    segments.append((text[pos:m.start()], False))
                segments.append((m.group(0), True))
                pos = m.end()
            if pos < len(text):
                segments.append((text[pos:], False))
        for seg, is_special in segments:
            if is_special:
                out.append(self.special_tokens[seg])
                continue
            for m in _SPLIT_RE.finditer(seg):
                word = "".join(_B2U[b] for b in m.group(0).encode("utf-8"))
                for piece in self._bpe_word(word):
                    tid = self.token_to_id.get(piece)
                    if tid is not None:
                        out.append(tid)
        return out

    def decode(self, ids) -> str:
        text = "".join(self.id_to_token[int(i)] for i in ids)
        data = bytes(_U2B.get(c, ord(" ")) for c in text)
        return data.decode("utf-8", errors="replace")
