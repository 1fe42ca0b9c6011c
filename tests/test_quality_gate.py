"""Quality-gate tool tests: the synthetic language's statistics and the
stale-params guard (tools/quality_gate.py). The gate itself (PPL deltas
per format) runs as a chip/CPU measurement stage, not in CI — these pin
the parts that broke in r05: an unlearnable language (no marginal
structure) and a vocab-mismatched params pickle being silently scored."""
import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parents[1]


@pytest.fixture()
def qg(monkeypatch):
    monkeypatch.setattr(sys, "argv", ["quality_gate.py"])
    spec = importlib.util.spec_from_file_location(
        "qg_under_test", ROOT / "tools" / "quality_gate.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def set_mid_language(qg):
    qg.VOCAB = 128
    qg.SUCC_PROBS = np.array([0.35, 0.2, 0.15, 0.1, 0.08, 0.06, 0.04, 0.02])
    zipf = 1.0 / np.arange(1, qg.VOCAB + 1)
    qg.SUCC_ZIPF = zipf / zipf.sum()


def test_small_language_unchanged(qg):
    """The small-geometry corpus is pinned — docs/QUALITY.md's committed
    table was produced from exactly this stream (SUCC_ZIPF=None path)."""
    h = qg.markov_corpus(64, seed=99)
    assert list(h[:10]) == [49, 53, 39, 33, 59, 10, 50, 7, 14, 15]


def test_mid_language_has_graded_structure(qg):
    """Zipf successor marginals make the mid language learnable: a
    context-free predictor already beats uniform 3x, and the true table
    sits far below that (uniform 128 > unigram ~42 > oracle ~5)."""
    set_mid_language(qg)
    heldout = qg.markov_corpus(8 * qg.CTX, seed=99)
    uni, oracle = qg.language_baselines(heldout)
    assert uni < 0.5 * qg.VOCAB, uni
    assert oracle < 0.25 * uni, (uni, oracle)


def test_language_is_order2(qg):
    """Same (a, b) context -> the successor support is the pinned table's,
    regardless of where in the stream the context occurs."""
    set_mid_language(qg)
    toks = qg.markov_corpus(4096, seed=3)
    ns = len(qg.SUCC_PROBS)
    lang = np.random.default_rng(0)
    succ = lang.choice(qg.VOCAB, size=(qg.VOCAB, qg.VOCAB, ns),
                       p=qg.SUCC_ZIPF)
    for i in range(2, 512):
        assert toks[i] in succ[toks[i - 2], toks[i - 1]]


def test_trajectory_seed_varies_only_sampling(qg):
    set_mid_language(qg)
    a = qg.markov_corpus(512, seed=1)
    b = qg.markov_corpus(512, seed=2)
    assert not np.array_equal(a, b)
    # both walk the same table
    lang = np.random.default_rng(0)
    succ = lang.choice(qg.VOCAB, size=(qg.VOCAB, qg.VOCAB,
                                       len(qg.SUCC_PROBS)), p=qg.SUCC_ZIPF)
    for s in (a, b):
        for i in range(2, 64):
            assert s[i] in succ[s[i - 2], s[i - 1]]


def test_stale_params_pickle_rejected(qg, tmp_path, monkeypatch):
    """r05 regression: a vocab-512 pickle must not be scored against a
    vocab-128 corpus. The cache key now names the language AND a shape
    guard rejects a hand-planted mismatch."""
    import pickle

    from ggml_imax_tpu.models import gpt2
    from ggml_imax_tpu.quant.formats import GGMLType

    # params trained at the WRONG vocab, planted under the mid cache key
    cfg_bad = gpt2.GPT2Config(n_vocab=64, n_ctx=256, n_embd=768, n_head=12,
                              n_layer=12)
    params = gpt2.synthetic_params(cfg_bad, GGMLType.F32, seed=0)
    cache_dir = tmp_path / ".jax_cache"
    cache_dir.mkdir()
    (cache_dir / "qgate_params_12L768E_V128z_3000.pkl").write_bytes(
        pickle.dumps(params))

    monkeypatch.setattr(sys, "argv",
                        ["quality_gate.py", "--geometry", "mid"])
    real_exists = Path.exists
    real_read = Path.read_bytes

    def fake_exists(self):
        if self.name.startswith("qgate_params_"):
            return real_exists(cache_dir / self.name)
        return real_exists(self)

    def fake_read(self):
        if self.name.startswith("qgate_params_"):
            return real_read(cache_dir / self.name)
        return real_read(self)

    monkeypatch.setattr(Path, "exists", fake_exists)
    monkeypatch.setattr(Path, "read_bytes", fake_read)
    with pytest.raises(SystemExit, match="wte vocab"):
        qg.main()
