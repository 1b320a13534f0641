"""Merge + encode stages (G3, A2, S3): the big shuffle.

Level 1: partials arrive as per-batch ENCODED posting runs (A1 emits
them); ``repartition(keys=["bucket","salt"]) -> encode_partition``
merges each (term, salt)'s runs into one posting list.  Hot terms
arrive pre-split into doc-range salts so no single group is unbounded
(SURVEY.md §4.3).

Level 2: ``.groupby("bucket").map_groups(FinalizeBucket)`` — splice each
hot term's salt runs back into one posting list via the O(1)-per-boundary
varint patch (codec.concat_runs), then write the bucket's segment +
dictionary parquet files deterministically and atomically, returning a
manifest row per bucket (lineage, BASELINE.json north_rule).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from web_search_engine_ray.functions import codec

SEGMENT_SCHEMA = pa.schema([
    ("term", pa.string()),
    ("bucket", pa.int32()),
    ("salt", pa.int32()),
    ("df", pa.int64()),
    ("cf", pa.int64()),
    ("n", pa.int64()),
    ("first_doc", pa.int64()),
    ("last_doc", pa.int64()),
    ("max_tf", pa.int32()),
    ("doc_bytes", pa.large_binary()),
    ("tf_bytes", pa.large_binary()),
    ("block_last_doc", pa.list_(pa.int64())),
    ("block_max_tf", pa.list_(pa.int32())),
    ("block_off_docs", pa.list_(pa.int64())),
    ("block_off_tfs", pa.list_(pa.int64())),
])

DICTIONARY_SCHEMA = pa.schema([
    ("term", pa.string()),
    ("bucket", pa.int32()),
    ("df", pa.int64()),
    ("cf", pa.int64()),
    ("max_tf", pa.int32()),
])


def _rows_to_encoded(row: dict) -> codec.EncodedPostings:
    return codec.EncodedPostings(
        n=row["n"], first_doc=row["first_doc"], last_doc=row["last_doc"],
        doc_bytes=row["doc_bytes"], tf_bytes=row["tf_bytes"],
        block_last_doc=np.asarray(row["block_last_doc"], dtype=np.int64),
        block_max_tf=np.asarray(row["block_max_tf"], dtype=np.int32),
        block_off_docs=np.asarray(row["block_off_docs"], dtype=np.int64),
        block_off_tfs=np.asarray(row["block_off_tfs"], dtype=np.int64),
        max_tf=row["max_tf"],
    )


def _encoded_to_columns(term: str, bucket: int, salt: int,
                        e: codec.EncodedPostings, cols: dict) -> None:
    cols["term"].append(term)
    cols["bucket"].append(bucket)
    cols["salt"].append(salt)
    cols["df"].append(e.n)
    cols["cf"].append(None)  # filled by caller (needs tf sum)
    cols["n"].append(e.n)
    cols["first_doc"].append(e.first_doc)
    cols["last_doc"].append(e.last_doc)
    cols["max_tf"].append(e.max_tf)
    cols["doc_bytes"].append(e.doc_bytes)
    cols["tf_bytes"].append(e.tf_bytes)
    cols["block_last_doc"].append(e.block_last_doc.tolist())
    cols["block_max_tf"].append(e.block_max_tf.tolist())
    cols["block_off_docs"].append(e.block_off_docs.tolist())
    cols["block_off_tfs"].append(e.block_off_tfs.tolist())


def _empty_cols() -> dict:
    return {name: [] for name in SEGMENT_SCHEMA.names}


def _binary_col_views(arr) -> tuple[np.ndarray, np.ndarray]:
    """(offsets int64[n+1], data uint8[...]) views of a LargeBinary array."""
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    off = np.frombuffer(arr.buffers()[1], dtype=np.int64)
    off = off[arr.offset:arr.offset + len(arr) + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return off, data


def encode_partition(batch: pa.Table) -> pa.Table:
    """Merge one hash partition of per-batch posting RUNS (whole
    (term, salt) groups co-located by ``repartition(keys=["bucket",
    "salt"])``) into one encoded posting list per (term, salt).

    Fully vectorized: ONE varbyte decode over the partition's
    concatenated doc/tf byte streams, per-run cumsum reconstruction,
    one ``encode_runs`` re-encode.  Re-encoding makes the final segment
    bytes a pure function of (corpus, config) — independent of input
    batching and worker count (determinism A.6 across cluster sizes).
    """
    if batch.num_rows == 0:
        return pa.table(_empty_cols(), schema=SEGMENT_SCHEMA)
    idx = pa.compute.sort_indices(
        batch, sort_keys=[("term", "ascending"), ("salt", "ascending"),
                          ("first_doc", "ascending")])
    t = batch.take(idx).combine_chunks()
    terms = t.column("term").to_pandas().to_numpy()
    salts = t.column("salt").to_numpy()
    buckets = t.column("bucket").to_numpy()
    n_run = t.column("n").to_numpy()
    # decode every run's doc deltas / tfs in one pass each
    d_off, d_data = _binary_col_views(t.column("doc_bytes"))
    t_off, t_data = _binary_col_views(t.column("tf_bytes"))
    deltas = codec.varbyte_decode(
        d_data[d_off[0]:d_off[-1]].tobytes()).astype(np.int64)
    tfs = codec.varbyte_decode(
        t_data[t_off[0]:t_off[-1]].tobytes()).astype(np.int64)
    total = int(n_run.sum())
    if len(deltas) != total or len(tfs) != total:
        raise ValueError("corrupt posting runs (value count mismatch)")
    # reconstruct doc ids: per-run cumsum with absolute first value
    vstarts = np.concatenate(([0], np.cumsum(n_run)[:-1])).astype(np.int64)
    g = np.cumsum(deltas)
    base = g[vstarts] - deltas[vstarts]
    docs = g - np.repeat(base, n_run)
    # (term, salt) group boundaries, in run space and value space
    change = np.flatnonzero((terms[1:] != terms[:-1])
                            | (salts[1:] != salts[:-1])) + 1
    gr_starts = np.concatenate(([0], change))
    gr_ends = np.concatenate((change, [len(terms)]))
    v_ends_all = np.concatenate((vstarts[1:], [total]))
    gv_starts = vstarts[gr_starts]
    gv_ends = v_ends_all[gr_ends - 1]
    # runs are doc-range ordered (sorted by first_doc); verify strict
    # monotonicity inside each group, repair out-of-order groups
    interior = np.ones(total, dtype=bool)
    interior[gv_starts] = False
    bad = np.flatnonzero((docs[1:] <= docs[:-1]) & interior[1:]) + 1
    if len(bad):
        bad_groups = np.unique(np.searchsorted(gv_starts, bad, "right") - 1)
        for gi in bad_groups:
            s, e = int(gv_starts[gi]), int(gv_ends[gi])
            order = np.argsort(docs[s:e], kind="stable")
            docs[s:e] = docs[s:e][order]
            tfs[s:e] = tfs[s:e][order]
            if (np.diff(docs[s:e]) <= 0).any():
                raise ValueError(
                    f"duplicate doc_id for term {terms[gr_starts[gi]]!r} — "
                    "run exact dedup (D1) before indexing")
    enc = codec.encode_runs(docs, tfs, gv_starts, gv_ends)
    first_runs = gr_starts
    return pa.table({
        "term": pa.array(terms[first_runs], pa.string()),
        "bucket": pa.array(buckets[first_runs], pa.int32()),
        "salt": pa.array(salts[first_runs], pa.int32()),
        "df": pa.array(enc["n"], pa.int64()),
        "cf": pa.array(enc["cf"], pa.int64()),
        "n": pa.array(enc["n"], pa.int64()),
        "first_doc": pa.array(enc["first_doc"], pa.int64()),
        "last_doc": pa.array(enc["last_doc"], pa.int64()),
        "max_tf": pa.array(enc["max_tf"].astype(np.int32), pa.int32()),
        "doc_bytes": pa.array(enc["doc_bytes"], pa.large_binary()),
        "tf_bytes": pa.array(enc["tf_bytes"], pa.large_binary()),
        "block_last_doc": pa.array(enc["block_last_doc"], pa.list_(pa.int64())),
        "block_max_tf": pa.array(enc["block_max_tf"], pa.list_(pa.int32())),
        "block_off_docs": pa.array(enc["block_off_docs"], pa.list_(pa.int64())),
        "block_off_tfs": pa.array(enc["block_off_tfs"], pa.list_(pa.int64())),
    }, schema=SEGMENT_SCHEMA)


class FinalizeBucket:
    """Per-bucket finalize: splice hot-term salt runs, write segment +
    dictionary parquet atomically, return a manifest row.

    Runs as ``groupby("bucket").map_groups(FinalizeBucket, ...)`` with
    ``fn_constructor_args=(seg_dir, dict_dir)``.  Files are written to a
    tmp path then os.replace'd — a killed merge leaves no partial bucket
    (checkpoint/resume substrate, SURVEY.md §4.3).  Scale note: on a
    multi-node cluster seg_dir must be shared storage (S3/NFS); the
    write pattern (one deterministic file per bucket) is unchanged.
    """

    def __init__(self, seg_dir: str, dict_dir: str):
        self.seg_dir = seg_dir
        self.dict_dir = dict_dir
        os.makedirs(seg_dir, exist_ok=True)
        os.makedirs(dict_dir, exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Handles one or more whole buckets per batch (hash partition)."""
        out = {"bucket": [], "n_terms": [], "n_postings": [],
               "sha256": [], "path": [], "dl_sum": [], "dl_min": []}
        if batch.num_rows:
            idx = pa.compute.sort_indices(
                batch, sort_keys=[("bucket", "ascending"),
                                  ("term", "ascending"),
                                  ("salt", "ascending")])
            tbl = batch.take(idx)
            buckets = tbl.column("bucket").to_numpy()
            change = np.flatnonzero(buckets[1:] != buckets[:-1]) + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [len(buckets)]))
            for s, e in zip(starts, ends):
                row = self._finalize_one(int(buckets[s]),
                                         tbl.slice(s, e - s).to_pylist())
                for k, v in row.items():
                    out[k].append(v)
        return pa.table({
            "bucket": pa.array(out["bucket"], pa.int32()),
            "n_terms": pa.array(out["n_terms"], pa.int64()),
            "n_postings": pa.array(out["n_postings"], pa.int64()),
            "sha256": pa.array(out["sha256"], pa.string()),
            "path": pa.array(out["path"], pa.string()),
            "dl_sum": pa.array(out["dl_sum"], pa.int64()),
            "dl_min": pa.array(out["dl_min"], pa.int64())})

    def _finalize_one(self, bucket: int, rows: list[dict]) -> dict:
        cols = _empty_cols()
        i = 0
        while i < len(rows):
            j = i
            while j < len(rows) and rows[j]["term"] == rows[i]["term"]:
                j += 1
            term_rows = rows[i:j]
            if len(term_rows) == 1:
                enc = _rows_to_encoded(term_rows[0])
            else:  # hot term: splice salt runs (doc-range ordered)
                enc = codec.concat_runs([_rows_to_encoded(r) for r in term_rows])
            _encoded_to_columns(term_rows[0]["term"], bucket, 0, enc, cols)
            cols["cf"][-1] = sum(r["cf"] for r in term_rows)
            i = j
        seg_tbl = pa.table(cols, schema=SEGMENT_SCHEMA)
        seg_path = os.path.join(self.seg_dir, f"bucket={bucket}.parquet")
        _atomic_write_parquet(seg_tbl, seg_path)
        # the doc-length sentinel stays in the segment (it IS the doc
        # length table) but never enters the term dictionary; its tf
        # stream gives the corpus dl stats for T5
        from web_search_engine_ray.spec import DL_SENTINEL
        dl_sum = 0
        dl_min = 0
        real = seg_tbl
        if cols["term"] and cols["term"][0] == DL_SENTINEL:
            dls = codec.varbyte_decode(cols["tf_bytes"][0], cols["n"][0])
            dl_sum = int(dls.sum())
            dl_min = int(dls.min())
            real = seg_tbl.slice(1)
        dict_tbl = pa.table({
            "term": real.column("term"),
            "bucket": real.column("bucket"),
            "df": real.column("df"),
            "cf": real.column("cf"),
            "max_tf": real.column("max_tf"),
        }, schema=DICTIONARY_SCHEMA)
        _atomic_write_parquet(dict_tbl, os.path.join(
            self.dict_dir, f"bucket={bucket}.parquet"))
        with open(seg_path, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()
        return {"bucket": bucket, "n_terms": real.num_rows,
                "n_postings": int(sum(cols["n"])), "sha256": digest,
                "path": seg_path, "dl_sum": dl_sum, "dl_min": dl_min}


_FINALIZE_CACHE: dict = {}


def finalize_buckets_task(batch: pa.Table, *, seg_dir: str,
                          dict_dir: str) -> pa.Table:
    """Task-execution form of FinalizeBucket (per-worker singleton)."""
    key = (seg_dir, dict_dir)
    inst = _FINALIZE_CACHE.get(key)
    if inst is None:
        _FINALIZE_CACHE.clear()
        inst = _FINALIZE_CACHE[key] = FinalizeBucket(seg_dir, dict_dir)
    return inst(batch)


def _atomic_write_parquet(tbl: pa.Table, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(tbl, tmp, compression="zstd")
    os.replace(tmp, path)
