"""Merge + encode stages (G3, A2, S3): the big shuffle.

Level 1: ``partials.groupby(["bucket","salt"]).map_groups(encode_group)``
— per (bucket, salt) group, sort postings by (term, doc_id) and
varbyte/delta-encode each term's run.  Hot terms arrive pre-split into
doc-range salts so no single group is unbounded (SURVEY.md §4.3).

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


def encode_partition(batch: pa.Table) -> pa.Table:
    """One hash partition of partials (whole (term, salt) groups are
    co-located by ``repartition(keys=["bucket","salt"])``) -> encoded
    posting runs, one row per (term, salt).

    Used as ``map_batches(encode_partition, batch_size=None)`` after a
    HASH_SHUFFLE repartition — a streaming hash exchange, cheaper than a
    sort-based groupby at every scale (no global sort of 10^12 posting
    rows; ordering is re-established per partition below).
    """
    if batch.num_rows == 0:
        return pa.table(_empty_cols(), schema=SEGMENT_SCHEMA)
    idx = pa.compute.sort_indices(
        batch, sort_keys=[("term", "ascending"), ("salt", "ascending"),
                          ("doc_id", "ascending")])
    t = batch.take(idx)
    terms = t.column("term").to_pandas().to_numpy()
    salts = t.column("salt").to_numpy()
    buckets = t.column("bucket").to_numpy()
    doc_ids = t.column("doc_id").to_numpy()
    tfs = t.column("tf").to_numpy()
    change = np.flatnonzero((terms[1:] != terms[:-1])
                            | (salts[1:] != salts[:-1])) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [len(terms)]))
    cols = _empty_cols()
    for s, e in zip(starts, ends):
        d = doc_ids[s:e]
        f = tfs[s:e]
        if len(d) > 1 and (d[1:] <= d[:-1]).any():
            raise ValueError(f"duplicate doc_id for term {terms[s]!r} — "
                             "run exact dedup (D1) before indexing")
        enc = codec.encode_postings(d, f)
        _encoded_to_columns(str(terms[s]), int(buckets[s]), int(salts[s]),
                            enc, cols)
        cols["cf"][-1] = int(f.sum())
    return pa.table(cols, schema=SEGMENT_SCHEMA)


def encode_group(group: pa.Table) -> pa.Table:
    """groupby(["bucket","salt"]).map_groups form of encode_partition
    (kept for the sort-shuffle fallback path)."""
    return encode_partition(group)


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
               "sha256": [], "path": []}
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
            "path": pa.array(out["path"], pa.string())})

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
        dict_tbl = pa.table({
            "term": seg_tbl.column("term"),
            "bucket": seg_tbl.column("bucket"),
            "df": seg_tbl.column("df"),
            "cf": seg_tbl.column("cf"),
            "max_tf": seg_tbl.column("max_tf"),
        }, schema=DICTIONARY_SCHEMA)
        _atomic_write_parquet(dict_tbl, os.path.join(
            self.dict_dir, f"bucket={bucket}.parquet"))
        with open(seg_path, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()
        return {"bucket": bucket, "n_terms": seg_tbl.num_rows,
                "n_postings": int(sum(cols["n"])), "sha256": digest,
                "path": seg_path}


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
