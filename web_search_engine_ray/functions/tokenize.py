"""Batch tokenization kernels (SURVEY.md §2.2 M2/M3, pinned in spec A.1).

All kernels take/return pyarrow-friendly dicts of numpy arrays so they
can run inside ``map_batches(batch_format="pyarrow")`` wrappers without
per-row Python in the surrounding plumbing.  The regex findall itself is
the pinned per-document hot loop (24 MB/s/core anchor, BASELINE.md).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

from web_search_engine_ray.spec import TOKEN_RE


def doc_lengths(texts: list[str]) -> np.ndarray:
    """Token count per document (pinned tokenizer)."""
    out = np.empty(len(texts), dtype=np.int64)
    findall = TOKEN_RE.findall
    for i, t in enumerate(texts):
        out[i] = len(findall(t.lower()))
    return out


def batch_postings(doc_ids: np.ndarray, texts: list[str]):
    """Tokenize a batch of docs -> flat (doc_id, term, tf, doc_len) arrays.

    One output row per (doc, distinct term).  ``doc_len`` is repeated per
    posting row so downstream stages never need a second tokenize pass.
    Terms within a doc are emitted in arbitrary (Counter) order — posting
    order is fixed later by the merge sort (SURVEY.md G3/O3).
    """
    out_docs: list[np.ndarray] = []
    out_terms: list[str] = []
    out_tfs: list[np.ndarray] = []
    out_dls: list[np.ndarray] = []
    findall = TOKEN_RE.findall
    for i, text in enumerate(texts):
        toks = findall(text.lower())
        if not toks:
            continue
        c = Counter(toks)
        k = len(c)
        out_terms.extend(c.keys())
        out_tfs.append(np.fromiter(c.values(), dtype=np.int64, count=k))
        out_docs.append(np.full(k, doc_ids[i], dtype=np.int64))
        out_dls.append(np.full(k, len(toks), dtype=np.int64))
    if not out_docs:
        return (np.empty(0, np.int64), [], np.empty(0, np.int64), np.empty(0, np.int64))
    return (
        np.concatenate(out_docs),
        out_terms,
        np.concatenate(out_tfs),
        np.concatenate(out_dls),
    )


def postings_table(doc_ids, terms, tfs, dls) -> pa.Table:
    return pa.table({
        "doc_id": pa.array(doc_ids, type=pa.int64()),
        "term": pa.array(terms, type=pa.string()),
        "tf": pa.array(tfs, type=pa.int64()),
        "doc_len": pa.array(dls, type=pa.int64()),
    })
