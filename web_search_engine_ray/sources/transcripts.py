"""Transcript sources: Parquet reader (S1/S2) + deterministic generator (S6).

Generator spec is FIXTURES.md F1/F2: all randomness flows from
``numpy.random.Generator(PCG64(derive_seed(global_seed, conv_rank)))``
so generation is order- and partition-independent (SURVEY.md A.6 — no
wall clock, no process-salted hashing).  ASCII-only vocabulary keeps the
pinned tokenizer in parity with the DuckDB oracle (SURVEY.md A.1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from web_search_engine_ray.spec import derive_seed

TRANSCRIPT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])

GLOBAL_SEED = 42
VOCAB_SIZE = 5000
ZIPF_S = 1.1
HOT_TERMS = [f"t{i:04d}" for i in range(10)]
HOT_INJECT_P = 0.9
TIE_TEXT = "alpha beta gamma alpha"
_TS_BASE_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in epoch micros

_VOCAB = np.array([f"t{i:04d}" for i in range(VOCAB_SIZE)])
_ZIPF_P = (1.0 / np.arange(1, VOCAB_SIZE + 1) ** ZIPF_S)
_ZIPF_P /= _ZIPF_P.sum()
_ZIPF_CDF = np.cumsum(_ZIPF_P)


def _zipf_draw(g: np.random.Generator, size: int) -> np.ndarray:
    """Vectorized Zipf draw via inverse-CDF (term indices)."""
    return np.searchsorted(_ZIPF_CDF, g.random(size), side="right")


def gen_conversation(conv_rank: int, seed: int = GLOBAL_SEED) -> dict[str, list]:
    """All turns of one conversation (FIXTURES.md F1), deterministic."""
    g = np.random.Generator(np.random.PCG64(derive_seed(seed, conv_rank)))
    n_turns = int(4 + g.integers(0, 28))
    conv_id = f"c{conv_rank:08d}"
    rows: dict[str, list] = {k: [] for k in
                             ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    lens = 8 + g.integers(0, 56, size=n_turns)
    tok_idx = _zipf_draw(g, int(lens.sum()))
    off = 0
    for t in range(n_turns):
        L = int(lens[t])
        words = list(_VOCAB[tok_idx[off:off + L]])
        off += L
        hot_mask = g.random(len(HOT_TERMS)) < HOT_INJECT_P
        words.extend(h for h, m in zip(HOT_TERMS, hot_mask) if m)
        text = " ".join(words)
        if t == 1 and conv_rank % 37 == 0:
            text = TIE_TEXT  # planted identical docs → score-tie path
        if t == 0:
            role = "user"
        elif g.random() < 0.2:
            role = "tool"
        else:
            role = "user" if t % 2 == 0 else "assistant"
        tool = f"tool{int(g.integers(0, 8))}" if role == "tool" else ""
        rows["conv_id"].append(conv_id)
        rows["turn_idx"].append(t)
        rows["role"].append(role)
        rows["text"].append(text)
        rows["tool"].append(tool)
        rows["ts"].append(_TS_BASE_US + conv_rank * 3_600_000_000 + t * 7_000_000)
    return rows


def _gen_batch(batch: dict[str, np.ndarray], seed: int) -> pa.Table:
    cols: dict[str, list] = {k: [] for k in
                             ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    for conv_rank in batch["id"].tolist():
        rows = gen_conversation(int(conv_rank), seed)
        for k in cols:
            cols[k].extend(rows[k])
    return pa.table({
        "conv_id": pa.array(cols["conv_id"], pa.string()),
        "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
        "role": pa.array(cols["role"], pa.string()),
        "text": pa.array(cols["text"], pa.string()),
        "tool": pa.array(cols["tool"], pa.string()),
        "ts": pa.array(cols["ts"], pa.timestamp("us")),
    })


def gen_transcripts(n_convs: int, seed: int = GLOBAL_SEED,
                    override_num_blocks: int | None = None) -> "ray.data.Dataset":
    """Deterministic synthetic corpus as a streaming Dataset (S6)."""
    ds = ray.data.range(n_convs, override_num_blocks=override_num_blocks)
    return ds.map_batches(_gen_batch, fn_kwargs={"seed": seed},
                          batch_format="numpy", batch_size=512)


def gen_transcripts_table(n_convs: int, seed: int = GLOBAL_SEED) -> pa.Table:
    """Driver-side (no Ray) generation for tests/oracles."""
    ids = {"id": np.arange(n_convs, dtype=np.int64)}
    return _gen_batch(ids, seed)


# --- reference query set (FIXTURES.md F2) --------------------------------


def gen_queries(seed: int = GLOBAL_SEED) -> pa.Table:
    g = np.random.Generator(np.random.PCG64(derive_seed(seed, "queries")))
    queries: list[str] = []
    for _ in range(40):                                   # unigram
        queries.append(str(_VOCAB[_zipf_draw(g, 1)[0]]))
    for _ in range(30):                                   # 2-3 term conjunctions
        k = int(2 + g.integers(0, 2))
        queries.append(" ".join(_VOCAB[_zipf_draw(g, k)]))
    for _ in range(10):                                   # hot-term-only (skew path)
        k = int(1 + g.integers(0, 2))
        queries.append(" ".join(g.choice(HOT_TERMS, size=k, replace=False)))
    for i in range(10):                                   # unseen-term path
        extra = str(_VOCAB[_zipf_draw(g, 1)[0]]) if i % 2 == 0 else ""
        queries.append(f"zz{i} {extra}".strip())
    for i in range(10):                                   # tie-prone
        queries.append(["alpha beta gamma", "alpha beta", "gamma alpha",
                        "beta", "alpha beta gamma alpha"][i % 5])
    return pa.table({
        "query_id": pa.array(np.arange(len(queries), dtype=np.int64)),
        "query": pa.array(queries, pa.string()),
    })


def read_transcripts(path: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """S1: Parquet -> Dataset[T1] with column pruning at the read."""
    return ray.data.read_parquet(path, columns=columns)


def read_queries(path: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(path)
