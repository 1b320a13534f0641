"""Incremental indexing: LSM-style delta-segment merge (SURVEY.md §2.9,
promoted from non-goal).

``merge_indexes(base_dir, delta_dir, out_dir)`` folds a DELTA index
(built independently over new conversations with ``build_index``) into a
BASE index without re-tokenizing either corpus: the delta's doc_ids are
remapped by ``offset = base.max_doc_id + 1`` (append semantics — base
ids stay stable), and every segment bucket merges independently, so the
whole merge is one embarrassingly-parallel pass over ``num_buckets``
tasks:

- term in base only  -> row copied byte-for-byte (no decode);
- term in delta only -> decode, ``+offset`` the doc ids, re-encode;
- term in both       -> decode both, concatenate (base docs < offset <=
  delta docs keeps the stream sorted), re-encode.

The doc-length table needs no special case: it rides the segments as
the ``DL_SENTINEL`` pseudo-term and merges like any other posting list.
BM25 results over the merged index match a full rebuild of the union
corpus exactly up to docID labeling (df/cf/N/avgdl/doc_len are
label-invariant; pinned by tests/test_merge_indexes.py against the
(conv_id, turn_idx, score) sets of a full rebuild).

Scale notes: per-bucket work is O(bucket bytes) with no shuffle at all
(both inputs are already term-bucketed by the same hash); a 256-node
cluster merges 64+ buckets fully in parallel. Base doc_table files are
hard-linked (copy fallback) — never rewritten; only the delta's
doc_table is rewritten (doc_id += offset).  Repeated deltas compose:
merge(merge(b, d1), d2) — compaction policy is the caller's.
"""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from web_search_engine_ray.functions import codec
from web_search_engine_ray.stages.encoder import (DICTIONARY_SCHEMA,
                                                  SEGMENT_SCHEMA,
                                                  _atomic_write_parquet,
                                                  _empty_cols,
                                                  _encoded_to_columns)
from web_search_engine_ray.state.manifest import read_stats, write_stats

_COMPAT_KEYS = ("num_buckets", "block_size", "k1", "b")


def _read_bucket(index_dir: str, bucket: int) -> "pa.Table | None":
    p = os.path.join(index_dir, "segments", f"bucket={bucket}.parquet")
    return pq.read_table(p) if os.path.exists(p) else None


def _term_bytes(views: tuple, i: int) -> bytes:
    off, data = views
    return bytes(data[off[i]:off[i + 1]])


def _merge_bucket(bucket: int, base_dir: str, delta_dir: str, out_dir: str,
                  offset: int, block_size: int) -> dict:
    """Merge one segment bucket; returns its manifest/stat row.

    Columnar: base-only terms (the dominant set as the base grows) pass
    through as ONE Arrow ``take`` — no decode, no per-term Python rows;
    only delta-touched terms loop (bounded by the DELTA bucket vocab),
    with posting bytes sliced zero-copy from the arrow buffers."""
    from web_search_engine_ray.spec import DL_SENTINEL
    from web_search_engine_ray.stages.encoder import _binary_col_views
    empty = pa.table(_empty_cols(), schema=SEGMENT_SCHEMA)
    bt = _read_bucket(base_dir, bucket)
    dt = _read_bucket(delta_dir, bucket)
    bt = empty if bt is None else bt.cast(SEGMENT_SCHEMA)
    dt = empty if dt is None else dt.cast(SEGMENT_SCHEMA)
    b_terms = np.asarray(bt.column("term").to_pylist(), dtype=object)
    d_terms = np.asarray(dt.column("term").to_pylist(), dtype=object)
    in_both_b = np.isin(b_terms, d_terms)
    in_both_d = np.isin(d_terms, b_terms)
    base_only = bt.take(pa.array(np.flatnonzero(~in_both_b), pa.int64()))
    n_postings = int(np.sum(base_only.column("n").to_numpy())) \
        if base_only.num_rows else 0
    cols = _empty_cols()
    if dt.num_rows:
        d_n = dt.column("n").to_numpy()
        d_cf = dt.column("cf").to_numpy()
        d_doc = _binary_col_views(dt.column("doc_bytes"))
        d_tf = _binary_col_views(dt.column("tf_bytes"))
        # delta-only terms: decode, +offset the doc ids, re-encode
        for j in np.flatnonzero(~in_both_d):
            docs, tfs = codec.decode_postings(
                _term_bytes(d_doc, j), _term_bytes(d_tf, j), int(d_n[j]))
            enc = codec.encode_postings(docs + offset, tfs, block_size)
            _encoded_to_columns(d_terms[j], bucket, 0, enc, cols)
            cols["cf"][-1] = int(d_cf[j])
            n_postings += enc.n
        # terms in both: decode both sides, concatenate (base docs <
        # offset <= shifted delta docs keeps the stream sorted), re-encode
        if in_both_b.any():
            b_n = bt.column("n").to_numpy()
            b_cf = bt.column("cf").to_numpy()
            b_doc = _binary_col_views(bt.column("doc_bytes"))
            b_tf = _binary_col_views(bt.column("tf_bytes"))
            for i, j in zip(np.flatnonzero(in_both_b),
                            np.flatnonzero(in_both_d)):
                docs_b, tfs_b = codec.decode_postings(
                    _term_bytes(b_doc, i), _term_bytes(b_tf, i), int(b_n[i]))
                docs_d, tfs_d = codec.decode_postings(
                    _term_bytes(d_doc, j), _term_bytes(d_tf, j), int(d_n[j]))
                enc = codec.encode_postings(
                    np.concatenate([docs_b, docs_d + offset]),
                    np.concatenate([tfs_b, tfs_d]), block_size)
                _encoded_to_columns(b_terms[i], bucket, 0, enc, cols)
                cols["cf"][-1] = int(b_cf[i]) + int(d_cf[j])
                n_postings += enc.n
    changed = pa.table(cols, schema=SEGMENT_SCHEMA)
    seg_tbl = pa.concat_tables([base_only, changed]).combine_chunks()
    if seg_tbl.num_rows:
        # restore the file's sorted-by-term order (utf8 bytewise ==
        # code-point order for these token strings; terms are unique
        # across the three disjoint subsets, so the order is total)
        seg_tbl = seg_tbl.take(pa.compute.sort_indices(
            seg_tbl, sort_keys=[("term", "ascending")]))
    _atomic_write_parquet(seg_tbl, os.path.join(
        out_dir, "segments", f"bucket={bucket}.parquet"))
    dl_sum = dl_min = 0
    real = seg_tbl
    if seg_tbl.num_rows and seg_tbl.column("term")[0].as_py() == DL_SENTINEL:
        dls = codec.varbyte_decode(seg_tbl.column("tf_bytes")[0].as_py(),
                                   int(seg_tbl.column("n")[0].as_py()))
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
        out_dir, "dictionary", f"bucket={bucket}.parquet"))
    return {"bucket": bucket, "n_terms": real.num_rows,
            "n_postings": n_postings, "dl_sum": dl_sum, "dl_min": dl_min}


def _merge_bucket_batch(batch: pa.Table, *, base_dir: str, delta_dir: str,
                        out_dir: str, offset: int,
                        block_size: int) -> pa.Table:
    rows = [_merge_bucket(int(b), base_dir, delta_dir, out_dir, offset,
                          block_size)
            for b in batch.column("id").to_pylist()]
    return pa.table({k: pa.array([r[k] for r in rows])
                     for k in ("bucket", "n_terms", "n_postings",
                               "dl_sum", "dl_min")})


def _link_or_copy(src: str, dst: str) -> None:
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst)


def merge_indexes(base_dir: str, delta_dir: str, out_dir: str) -> dict:
    """Fold ``delta_dir`` into ``base_dir`` producing ``out_dir``;
    returns the merged stats dict.  Both indexes must share the layout
    config (bucket count, block size, BM25 params)."""
    base = read_stats(base_dir)
    delta = read_stats(delta_dir)
    for key in _COMPAT_KEYS:
        if base.get(key) != delta.get(key):
            raise ValueError(
                f"incompatible indexes: {key} differs "
                f"({base.get(key)} vs {delta.get(key)})")
    offset = int(base["max_doc_id"]) + 1
    nb = int(base["num_buckets"])
    os.makedirs(os.path.join(out_dir, "segments"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "dictionary"), exist_ok=True)

    n_cpus = max(1, int(ray.cluster_resources().get("CPU", 4)))
    buckets = ray.data.range(nb).repartition(
        num_blocks=min(nb, max(4, n_cpus)))
    rows = buckets.map_batches(
        _merge_bucket_batch, batch_format="pyarrow", batch_size=None,
        fn_kwargs=dict(base_dir=base_dir, delta_dir=delta_dir,
                       out_dir=out_dir, offset=offset,
                       block_size=int(base["block_size"])))
    agg = pa.concat_tables(list(rows.iter_batches(batch_format="pyarrow")))
    dl_sum = int(np.sum(agg.column("dl_sum").to_numpy()))
    dl_mins = agg.column("dl_min").to_numpy()
    dl_mins = dl_mins[dl_mins > 0]

    # doc_table: base files hard-linked (content-stable ids); delta
    # rewritten once with doc_id += offset — a streaming, partitioned
    # write (resumable per delta)
    dt_out = os.path.join(out_dir, "doc_table")
    os.makedirs(dt_out, exist_ok=True)
    for f in sorted(glob.glob(os.path.join(base_dir, "doc_table",
                                           "*.parquet"))):
        dst = os.path.join(dt_out, "base-" + os.path.basename(f))
        if not os.path.exists(dst):
            _link_or_copy(f, dst)

    def _shift_docs(batch: pa.Table) -> pa.Table:
        ids = pa.array(batch.column("doc_id").to_numpy() + offset,
                       pa.int64())
        return batch.set_column(batch.schema.get_field_index("doc_id"),
                                "doc_id", ids)

    delta_dt = os.path.join(delta_dir, "doc_table")
    if os.path.isdir(delta_dt):
        ray.data.read_parquet(delta_dt).map_batches(
            _shift_docs, batch_format="pyarrow",
            zero_copy_batch=True).write_parquet(dt_out)

    n_docs = int(base["n_docs"]) + int(delta["n_docs"])
    stats = {k: base[k] for k in ("b", "k1", "block_size", "num_buckets",
                                  "salt_s") if k in base}
    stats.update({
        "n_docs": n_docs,
        "max_doc_id": offset + int(delta["max_doc_id"]),
        "total_tokens": dl_sum,
        "avgdl": (dl_sum / n_docs) if n_docs else 0.0,
        "dl_min": int(dl_mins.min()) if len(dl_mins) else 1,
        "config_hash": base.get("config_hash", ""),
        "merged_from": [base_dir, delta_dir],
    })
    write_stats(out_dir, stats)
    return stats
