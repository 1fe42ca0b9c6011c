"""Tokenizer parity vs HuggingFace on a real trained vocabulary.

The reference CI checks its BPE against HuggingFace tokenization of real
prompts (/root/reference/examples/common.h:94-101 gpt_vocab notes,
ci/run.sh:90). No pretrained vocab is downloadable in this sandbox, so the
differential oracle is trained here: a genuine byte-level BPE (HF
`tokenizers`, the same Rust codepath HF slow/fast GPT-2 tokenizers share)
trained on a deterministic corpus to 800 merges, then every prompt must
encode to the identical id sequence through our ByteLevelBPETokenizer.
"""
import json

import pytest

tokenizers = pytest.importorskip("tokenizers")

from ggml_imax_tpu.tokenizer.bpe import ByteLevelBPETokenizer

WORDS = [
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
    "meaning", "of", "life", "is", "believe", "building", "website",
    "simple", "as", "three", "steps", "tokens", "model", "quantize",
    "tensor", "kernel", "attention", "head", "layer", "norm", "scale",
    "block", "format", "weight", "matrix", "vector", "product", "numbers",
    "1", "2", "3", "42", "100", "3.14159", "hello", "world",
]

PROMPTS = [
    "I believe the meaning of life is",                      # ci/run.sh prompt
    "Building a website can be done in 10 simple steps:",
    "Hello, World!  \t multiple   spaces\nand\nnewlines",
    "don't can't won't it's we're I'll you've they'd",       # contractions
    "MixedCASE wordsWith numbers123 and 456mixed",
    "  leading spaces and trailing   ",
    "punctuation!?.,;:()[]{}<>@#$%^&*-_=+|\\/~`\"'",
    "unicode: café naïve 中文 рус \U0001f600 ☃",
    "",                                                      # empty
    "a",                                                     # single char
    "\n\n\n",                                                # only whitespace
    "tab\tseparated\tvalues",
]


@pytest.fixture(scope="module")
def trained():
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

    # deterministic corpus: cyclic sentences over the word list
    corpus = []
    for i in range(600):
        ws = [WORDS[(i * 7 + j * 3) % len(WORDS)] for j in range(12)]
        corpus.append(" ".join(ws) + ("." if i % 3 else "!"))
    corpus += PROMPTS * 3                                    # cover the battery

    hf = Tokenizer(models.BPE())
    hf.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    hf.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=800, special_tokens=[], show_progress=False,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    hf.train_from_iterator(corpus, trainer)

    state = json.loads(hf.to_str())
    merges = state["model"]["merges"]
    merges = [m if isinstance(m, str) else " ".join(m) for m in merges]
    vocab_map = state["model"]["vocab"]
    vocab = [None] * len(vocab_map)
    for t, i in vocab_map.items():
        vocab[i] = t
    ours = ByteLevelBPETokenizer(vocab, merges)
    return hf, ours


@pytest.mark.parametrize("prompt", PROMPTS, ids=range(len(PROMPTS)))
def test_encode_matches_hf(trained, prompt):
    hf, ours = trained
    assert ours.encode(prompt) == hf.encode(prompt).ids


def test_decode_roundtrip_matches_hf(trained):
    hf, ours = trained
    for prompt in PROMPTS:
        ids = ours.encode(prompt)
        assert ours.decode(ids) == hf.decode(ids)


def test_corpus_sweep(trained):
    """Beyond the hand-picked battery: 200 generated lines must all agree."""
    hf, ours = trained
    for i in range(200):
        line = " ".join(WORDS[(i * 11 + j * 5) % len(WORDS)]
                        for j in range(1 + i % 17))
        if i % 4 == 0:
            line = line.upper()
        if i % 5 == 0:
            line = "  " + line + "\t"
        assert ours.encode(line) == hf.encode(line).ids, line
