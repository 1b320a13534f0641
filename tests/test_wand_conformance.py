"""Randomized WAND conformance (SURVEY.md §5.2): for seeded random
corpora × random queries, block-max WAND over real encoded segments must
equal the naive exhaustive oracle exactly — top-k doc_id sequence and
bit-equal float64 scores.  No Ray needed (MemoryIndex uses the real
codec + the real wand_topk)."""

import numpy as np
import pyarrow as pa
import pytest

from web_search_engine_ray.stages.scorer import MemoryIndex, OracleScorer

N_CORPORA = 12
N_QUERIES = 20


def _random_corpus(rng: np.random.Generator) -> pa.Table:
    n_docs = int(rng.integers(5, 400))
    vocab = [f"w{i}" for i in range(int(rng.integers(3, 60)))]
    probs = 1.0 / np.arange(1, len(vocab) + 1) ** rng.uniform(0.5, 1.5)
    probs /= probs.sum()
    texts = []
    for _ in range(n_docs):
        ln = int(rng.integers(0, 40))
        texts.append(" ".join(rng.choice(vocab, size=ln, p=probs))
                     if ln else "")
    # sprinkle identical docs to force exact score ties
    for _ in range(int(rng.integers(0, 5))):
        i, j = rng.integers(0, n_docs, size=2)
        texts[int(i)] = texts[int(j)]
    # non-dense doc ids exercise doc-id arithmetic
    ids = np.sort(rng.choice(n_docs * 3, size=n_docs, replace=False))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def _random_query(rng: np.random.Generator, vocab_hint: list[str]) -> str:
    n = int(rng.integers(1, 5))
    words = list(rng.choice(vocab_hint, size=n))
    if rng.random() < 0.2:
        words.append("unseenzzz")
    if rng.random() < 0.2 and words:
        words.append(words[0])          # duplicate term
    return " ".join(words)


@pytest.mark.parametrize("seed", range(N_CORPORA))
def test_wand_equals_oracle(seed):
    rng = np.random.default_rng(1000 + seed)
    corpus = _random_corpus(rng)
    idx = MemoryIndex(corpus)
    orc = OracleScorer(corpus)
    vocab = [f"w{i}" for i in range(60)]
    for qi in range(N_QUERIES):
        q = _random_query(rng, vocab)
        k = int(rng.integers(1, 15))
        od, osc = orc.topk(q, k)
        wd, ws = idx.topk(q, k)
        assert wd.tolist() == od, (seed, qi, q, k)
        assert np.array_equal(ws, np.array(osc)), (seed, qi, q, k)
