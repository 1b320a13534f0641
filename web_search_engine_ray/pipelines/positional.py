"""Positional postings sidecar index + index-native exact phrase search.

Layout: ``out_dir/pos_bucket={b}.parquet``, rows sorted by term:

    term:str, n_docs:int64,
    doc_bytes:binary   (varbyte of delta(doc_ids)),
    npos_bytes:binary  (varbyte of per-doc occurrence counts),
    pos_bytes:binary   (per doc: varbyte of delta(positions), first
                        absolute; concatenated in doc order)

Positions are 0-based token indexes in the pinned tokenizer's output
(spec.tokenize), so "consecutive positions" is exactly the regex
adjacency semantics curation.phrase_regex pins — both engines share
the DuckDB oracle.

Build = ONE streaming tokenize pass emitting a row per (term, doc)
with that doc's encoded position list, then ONE hash exchange on
bucket = sha1(term) % B, then a per-bucket vectorized finalize (sort,
group, splice, atomic tmp+rename write).  Same shuffle discipline as
the main index (stages/encoder.py): the partition key is reused
end-to-end and nothing global-sorts.  The per-batch kernel is fully
vectorized: one lexsort + one varbyte_encode per batch, sliced per
group by cumulative byte lengths — no per-occurrence Python work.

Query = pure index lookups, never the corpus text: for a phrase
[t0..tk], each term's occurrences become composite keys
``doc_id << POS_SHIFT | (position - i)``; intersecting the k+1 key
sets leaves exactly the docs where every term appears at consecutive
positions.  (curation.phrase_search keeps the candidate+regex
verification path for indexes built WITHOUT positions.)
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from web_search_engine_ray.functions import codec
from web_search_engine_ray.functions.grouping import group_slices, hash_partition
from web_search_engine_ray.spec import term_bucket, tokenize

POS_SHIFT = 21                 # positions < 2^21 tokens/doc; doc_id < 2^42
MAX_DOC_TOKENS = (1 << POS_SHIFT) - 1
DEFAULT_POS_BUCKETS = 16

POS_SCHEMA = pa.schema([
    ("bucket", pa.int32()),
    ("term", pa.string()),
    ("n_docs", pa.int64()),
    ("doc_bytes", pa.binary()),
    ("npos_bytes", pa.binary()),
    ("pos_bytes", pa.binary()),
])


# --- build -----------------------------------------------------------------


def _pos_rows(batch: pa.Table, *, num_buckets: int) -> pa.Table:
    """Per-batch map: one output row per (term, doc) with the doc's
    delta+varbyte-encoded occurrence positions."""
    import pandas as pd

    texts = batch.column("text").to_pylist()
    doc_ids = batch.column("doc_id").to_numpy()
    all_toks: list[str] = []
    doc_rows: list[int] = []            # batch rows that have tokens
    tok_counts: list[int] = []
    for r, text in enumerate(texts):
        toks = tokenize(text)
        if not toks:
            continue
        if len(toks) > MAX_DOC_TOKENS:
            raise ValueError(
                f"doc {doc_ids[r]} has {len(toks)} tokens > 2^{POS_SHIFT}-1;"
                " raise POS_SHIFT for monster documents")
        all_toks.extend(toks)
        doc_rows.append(r)
        tok_counts.append(len(toks))
    empty = pa.table({"bucket": pa.array([], pa.int32()),
                      "term": pa.array([], pa.string()),
                      "doc_id": pa.array([], pa.int64()),
                      "n_pos": pa.array([], pa.int64()),
                      "pos_bytes": pa.array([], pa.binary())})
    if not all_toks:
        return empty
    code, uniques = pd.factorize(np.asarray(all_toks, dtype=object))
    code = code.astype(np.int64)
    counts = np.asarray(tok_counts, np.int64)
    drow = np.repeat(np.asarray(doc_rows, np.int64), counts)
    ends_tok = np.cumsum(counts)
    pos = np.arange(len(code), dtype=np.int64) - \
        np.repeat(ends_tok - counts, counts)
    terms = list(uniques)
    # group by (doc, term); stable sort keeps positions ascending in-group
    order = np.lexsort((code, drow))
    code, drow, pos = code[order], drow[order], pos[order]
    starts, ends = group_slices([drow, code])
    # per-group delta with absolute first value, computed flat
    deltas = pos.copy()
    deltas[1:] -= pos[:-1]
    deltas[starts] = pos[starts]
    buf = codec.varbyte_encode(deltas)
    nbytes = codec.varbyte_nbytes(deltas)
    byte_ends = np.cumsum(nbytes)
    byte_starts = byte_ends - nbytes
    mv = memoryview(buf)
    term_arr = np.asarray(terms, dtype=object)
    g_terms = term_arr[code[starts]]
    bucket_of = {t: term_bucket(t, num_buckets) for t in terms}
    return pa.table({
        "bucket": pa.array([bucket_of[t] for t in g_terms], pa.int32()),
        "term": pa.array(g_terms, pa.string()),
        "doc_id": pa.array(doc_ids[drow[starts]], pa.int64()),
        "n_pos": pa.array(ends - starts, pa.int64()),
        "pos_bytes": pa.array(
            [bytes(mv[byte_starts[s]:byte_ends[e - 1]])
             for s, e in zip(starts, ends)], pa.binary()),
    })


def _finalize_pos_bucket(batch: pa.Table, *, out_dir: str) -> pa.Table:
    """Reduce side: one or more WHOLE buckets per block (hash_partition
    invariant); per term splice doc runs in doc_id order, atomic write."""
    empty = pa.table({"bucket": pa.array([], pa.int32()),
                      "n_terms": pa.array([], pa.int64()),
                      "n_postings": pa.array([], pa.int64()),
                      "path": pa.array([], pa.string()),
                      "sha256": pa.array([], pa.string())})
    if batch.num_rows == 0:
        return empty
    idx = pa.compute.sort_indices(batch, sort_keys=[
        ("bucket", "ascending"), ("term", "ascending"),
        ("doc_id", "ascending")])
    tbl = batch.take(idx)
    buckets = tbl.column("bucket").to_numpy()
    terms = np.asarray(tbl.column("term").to_pylist(), dtype=object)
    doc_ids = tbl.column("doc_id").to_numpy()
    n_pos = tbl.column("n_pos").to_numpy()
    pos_bytes = tbl.column("pos_bytes").to_pylist()
    rows = {"bucket": [], "n_terms": [], "n_postings": [],
            "path": [], "sha256": []}
    b_starts, b_ends = group_slices([buckets])
    for bs, be in zip(b_starts, b_ends):
        bkt = int(buckets[bs])
        cols = {"bucket": [], "term": [], "n_docs": [], "doc_bytes": [],
                "npos_bytes": [], "pos_bytes": []}
        t_starts, t_ends = group_slices([terms[bs:be]])
        for ts, te in zip(t_starts + bs, t_ends + bs):
            ids = doc_ids[ts:te]
            if len(np.unique(ids)) != len(ids):
                raise ValueError(
                    f"duplicate doc_id for term {terms[ts]!r}: corpus has"
                    " duplicate doc_ids (run exact dedup first)")
            cols["bucket"].append(bkt)
            cols["term"].append(terms[ts])
            cols["n_docs"].append(te - ts)
            cols["doc_bytes"].append(
                codec.varbyte_encode(codec.delta_encode(ids)))
            cols["npos_bytes"].append(codec.varbyte_encode(n_pos[ts:te]))
            cols["pos_bytes"].append(b"".join(pos_bytes[ts:te]))
        seg = pa.table({
            "bucket": pa.array(cols["bucket"], pa.int32()),
            "term": pa.array(cols["term"], pa.string()),
            "n_docs": pa.array(cols["n_docs"], pa.int64()),
            "doc_bytes": pa.array(cols["doc_bytes"], pa.binary()),
            "npos_bytes": pa.array(cols["npos_bytes"], pa.binary()),
            "pos_bytes": pa.array(cols["pos_bytes"], pa.binary()),
        }, schema=POS_SCHEMA)
        path = os.path.join(out_dir, f"pos_bucket={bkt}.parquet")
        tmp = path + ".tmp"
        os.makedirs(out_dir, exist_ok=True)
        pq.write_table(seg, tmp, compression="zstd")
        os.replace(tmp, path)
        with open(path, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()
        rows["bucket"].append(bkt)
        rows["n_terms"].append(seg.num_rows)
        rows["n_postings"].append(int(np.sum(n_pos[bs:be])))
        rows["path"].append(path)
        rows["sha256"].append(digest)
    return pa.table({"bucket": pa.array(rows["bucket"], pa.int32()),
                     "n_terms": pa.array(rows["n_terms"], pa.int64()),
                     "n_postings": pa.array(rows["n_postings"], pa.int64()),
                     "path": pa.array(rows["path"], pa.string()),
                     "sha256": pa.array(rows["sha256"], pa.string())})


def build_positional_index(corpus: "ray.data.Dataset | str", out_dir: str,
                           num_buckets: int = DEFAULT_POS_BUCKETS
                           ) -> list[dict]:
    """Build the positional sidecar; returns per-bucket manifest rows.

    Scale: the (term, doc) row stream is the standard positional-index
    build volume (≈ one row per distinct term per doc, positions
    varbyte-packed at emit time so the exchange moves bytes, not
    int64s); ONE hash shuffle on the bucket key; finalize writes one
    deterministic file per bucket (resumable layout)."""
    ds = ray.data.read_parquet(corpus, columns=["doc_id", "text"]) \
        if isinstance(corpus, str) else corpus.select_columns(
            ["doc_id", "text"])
    runs = ds.map_batches(_pos_rows, fn_kwargs=dict(num_buckets=num_buckets),
                          batch_format="pyarrow", zero_copy_batch=True)
    rows = (hash_partition(runs, ["bucket"],
                           num_partitions=num_buckets)
            .map_batches(_finalize_pos_bucket,
                         fn_kwargs=dict(out_dir=out_dir),
                         batch_size=None, batch_format="pyarrow",
                         zero_copy_batch=True)
            .take_all())
    return rows


# --- query -----------------------------------------------------------------


class PositionalReader:
    """Opens a positional index dir; per-term decode with a small cache.
    Bucket tables are read lazily and filtered to the requested term
    (row-group pruning via the sorted term column)."""

    def __init__(self, out_dir: str,
                 num_buckets: int = DEFAULT_POS_BUCKETS):
        self.out_dir = out_dir
        self.num_buckets = num_buckets
        self._cache: dict[str, tuple | None] = {}

    def postings(self, term: str):
        """(doc_ids, npos, positions_flat) or None for an absent term."""
        if term in self._cache:
            return self._cache[term]
        path = os.path.join(
            self.out_dir,
            f"pos_bucket={term_bucket(term, self.num_buckets)}.parquet")
        out = None
        if os.path.exists(path):
            tbl = pq.read_table(path, filters=[("term", "=", term)])
            if tbl.num_rows:
                n_docs = int(tbl.column("n_docs")[0].as_py())
                doc_ids = codec.delta_decode(codec.varbyte_decode(
                    tbl.column("doc_bytes")[0].as_py(), n_docs))
                npos = codec.varbyte_decode(
                    tbl.column("npos_bytes")[0].as_py(),
                    n_docs).astype(np.int64)
                flat = codec.varbyte_decode(
                    tbl.column("pos_bytes")[0].as_py(),
                    int(npos.sum())).astype(np.int64)
                # undo per-doc delta: subtract the running total at each
                # doc boundary from the flat cumsum
                c = np.cumsum(flat)
                ends = np.cumsum(npos)
                prev = np.concatenate(([0], c[ends[:-1] - 1]))
                positions = c - np.repeat(prev, npos)
                out = (doc_ids.astype(np.int64), npos.astype(np.int64),
                       positions.astype(np.int64))
        self._cache[term] = out
        return out


def phrase_docs(reader: PositionalReader, phrase: str) -> np.ndarray:
    """doc_ids containing the phrase's tokens at consecutive positions."""
    toks = tokenize(phrase)
    if not toks:
        return np.empty(0, np.int64)
    run: np.ndarray | None = None
    for i, t in enumerate(toks):
        p = reader.postings(t)
        if p is None:
            return np.empty(0, np.int64)
        doc_ids, npos, pos = p
        docs_rep = np.repeat(doc_ids, npos)
        m = pos >= i                      # earlier positions can't anchor
        keys = (docs_rep[m] << POS_SHIFT) | (pos[m] - i)
        run = keys if run is None else np.intersect1d(
            run, keys, assume_unique=True)
        if len(run) == 0:
            return np.empty(0, np.int64)
    return np.unique(run >> POS_SHIFT)


@ray.remote
def _phrase_task(out_dir: str, num_buckets: int, pid: int,
                 phrase: str) -> tuple[int, np.ndarray]:
    return pid, phrase_docs(PositionalReader(out_dir, num_buckets), phrase)


def phrase_search_pos(out_dir: str, phrases: list[tuple[int, str]],
                      num_buckets: int = DEFAULT_POS_BUCKETS) -> pa.Table:
    """(phrase_id, doc_id) for each phrase — one Ray task per phrase;
    each task reads only its terms' buckets."""
    refs = [_phrase_task.remote(out_dir, num_buckets, pid, ph)
            for pid, ph in phrases]
    pid_out: list[np.ndarray] = []
    doc_out: list[np.ndarray] = []
    for pid, docs in ray.get(refs):
        pid_out.append(np.full(len(docs), pid, np.int64))
        doc_out.append(docs)
    pids = np.concatenate(pid_out) if pid_out else np.empty(0, np.int64)
    docs = np.concatenate(doc_out) if doc_out else np.empty(0, np.int64)
    tbl = pa.table({"phrase_id": pa.array(pids, pa.int64()),
                    "doc_id": pa.array(docs, pa.int64())})
    return tbl.sort_by([("phrase_id", "ascending"),
                        ("doc_id", "ascending")])
