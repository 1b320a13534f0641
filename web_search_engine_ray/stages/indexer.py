"""Indexing stages: docID assignment (O1/O2), doc_table (M2/M3),
partial-posting emission (A1), hot-term detection (G6).

A1 is a callable class run as an actor pool via
``map_batches(PartitionIndexer, concurrency=..., batch_format="pyarrow")``
— stateful per BASELINE.json:15: the hot-term set and the term→bucket
hash cache are built once per actor in ``__init__``, not per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from web_search_engine_ray.functions.tokenize import batch_postings, doc_lengths
from web_search_engine_ray.spec import EngineConfig, term_bucket


# --- O1/O2: deterministic dense doc_id ----------------------------------


def conversation_offsets_from_parquet(path: str) -> tuple[dict[str, int], int]:
    """Small-input fast path: read only (conv_id, turn_idx) columns with
    pyarrow on the driver — cheaper than a Ray job below ~20M rows.
    Same validation + prefix-sum semantics as conversation_offsets."""
    import pyarrow.dataset as pads
    tbl = pads.dataset(path, format="parquet").to_table(
        columns=["conv_id", "turn_idx"])
    g = pa.TableGroupBy(tbl, "conv_id").aggregate(
        [("turn_idx", "count"), ("turn_idx", "min"), ("turn_idx", "max"),
         ("turn_idx", "count_distinct")])
    n = g.column("turn_idx_count").to_numpy().astype(np.int64)
    nd = g.column("turn_idx_count_distinct").to_numpy().astype(np.int64)
    conv_ids = np.asarray(g.column("conv_id").to_pandas())
    if (nd != n).any():
        bad = conv_ids[nd != n][0]
        raise ValueError(
            f"duplicate turn_idx values for conv_id={bad!r}; "
            "dedup/repair input before indexing (SURVEY.md D1)")
    return _offsets_from_conv(
        conv_ids, n,
        g.column("turn_idx_min").to_numpy().astype(np.int64),
        g.column("turn_idx_max").to_numpy().astype(np.int64))


def _offsets_from_conv(conv_ids: np.ndarray, n_turns: np.ndarray,
                       mn: np.ndarray, mx: np.ndarray) -> tuple[dict, int]:
    if not ((mn == 0).all() and (mx == n_turns - 1).all()):
        bad = conv_ids[(mn != 0) | (mx != n_turns - 1)][0]
        raise ValueError(
            f"turn_idx not dense 0..n-1 for conv_id={bad!r}; "
            "dedup/repair input before indexing (SURVEY.md D1)")
    order = np.argsort(conv_ids, kind="stable")
    conv_sorted = conv_ids[order]
    sizes = n_turns[order]
    offsets = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    return dict(zip(conv_sorted.tolist(), offsets.tolist())), int(sizes.sum())


def _partial_conv_counts(batch: pa.Table) -> pa.Table:
    """Per-block combiner: shrinks the shuffle from one row per TURN to
    one row per (block, conv) before the conv-level reduce.

    Besides count/min/max it carries a within-block distinct count and
    the turn_idx sum / sum-of-squares, so the density validation also
    catches duplicates that cancel a gap (e.g. [0,2,2]: min 0, max 2,
    count 3 would otherwise pass — the sum check rejects 4 != 3, the
    distinct check rejects same-block copies outright)."""
    tix = batch.column("turn_idx").to_numpy().astype(np.int64)
    g = pd.DataFrame({
        "conv_id": batch.column("conv_id").to_pandas(),
        "turn_idx": tix,
        "tix2": tix * tix,
    }).groupby("conv_id", sort=False).agg(
        count=("turn_idx", "count"), mn=("turn_idx", "min"),
        mx=("turn_idx", "max"), nd=("turn_idx", "nunique"),
        s=("turn_idx", "sum"), s2=("tix2", "sum"))
    return pa.table({
        "conv_id": pa.array(g.index, pa.string()),
        "n": pa.array(g["count"].to_numpy(), pa.int64()),
        "mn": pa.array(g["mn"].to_numpy().astype(np.int32), pa.int32()),
        "mx": pa.array(g["mx"].to_numpy().astype(np.int32), pa.int32()),
        "nd": pa.array(g["nd"].to_numpy(), pa.int64()),
        "s": pa.array(g["s"].to_numpy(), pa.int64()),
        "s2": pa.array(g["s2"].to_numpy(), pa.int64()),
    })


def _check_dense(conv_ids, n, mn, mx, nd_sum, s, s2) -> None:
    """Dense-0..n-1 validation: min/max/count plus (a) per-block distinct
    == count (no same-block duplicates) and (b) sum + sum-of-squares
    matching 0..n-1 exactly — together these reject every duplicate that
    cancels a gap short of a crafted multi-block collision matching both
    moments (practically unreachable; fully sound after dedup_turns)."""
    exp_s = n * (n - 1) // 2
    exp_s2 = (n - 1) * n * (2 * n - 1) // 6
    bad = (mn != 0) | (mx != n - 1) | (nd_sum != n) | (s != exp_s) \
        | (s2 != exp_s2)
    if bad.any():
        bad_id = list(conv_ids)[int(np.flatnonzero(bad)[0])]
        raise ValueError(
            f"turn_idx not dense 0..n-1 for conv_id={bad_id!r}; "
            "dedup/repair input before indexing (SURVEY.md D1)")


def conversation_offsets(ds: "ray.data.Dataset") -> tuple[dict[str, int], int]:
    """Per-conversation docID offsets via conv-level prefix sums
    (driver-combine FAST PATH for small inputs; the distributed form is
    conversation_offsets_ds + assign_doc_ids_join).

    Valid because turn_idx is dense 0..n-1 per conversation (validated
    here — SURVEY.md A.3): sorting the *conversation* table bytewise by
    conv_id and prefix-summing turn counts yields exactly the global
    (conv_id asc, turn_idx asc) dense enumeration, without a full-data
    sort shuffle.
    """
    partial_tbls = [b for b in ds.select_columns(["conv_id", "turn_idx"])
                    .map_batches(_partial_conv_counts, batch_format="pyarrow",
                                 zero_copy_batch=True)
                    .iter_batches(batch_format="pyarrow", batch_size=None)]
    if not partial_tbls:
        return {}, 0
    allp = pa.concat_tables(partial_tbls).to_pandas()
    conv = allp.groupby("conv_id", sort=False).agg(
        n=("n", "sum"), mx=("mx", "max"), mn=("mn", "min"),
        nd=("nd", "sum"), s=("s", "sum"), s2=("s2", "sum")).reset_index()
    _check_dense(conv["conv_id"].to_numpy(), conv["n"].to_numpy(),
                 conv["mn"].to_numpy().astype(np.int64),
                 conv["mx"].to_numpy().astype(np.int64),
                 conv["nd"].to_numpy(), conv["s"].to_numpy(),
                 conv["s2"].to_numpy())
    return _offsets_from_conv(conv["conv_id"].to_numpy(),
                              conv["n"].to_numpy(), conv["mn"].to_numpy(),
                              conv["mx"].to_numpy())


def _validate_conv_agg(batch: pa.Table) -> pa.Table:
    n = batch.column("sum(n)").to_numpy().astype(np.int64)
    _check_dense(batch.column("conv_id").to_pylist(), n,
                 batch.column("min(mn)").to_numpy().astype(np.int64),
                 batch.column("max(mx)").to_numpy().astype(np.int64),
                 batch.column("sum(nd)").to_numpy().astype(np.int64),
                 batch.column("sum(s)").to_numpy().astype(np.int64),
                 batch.column("sum(s2)").to_numpy().astype(np.int64))
    return pa.table({"conv_id": batch.column("conv_id"),
                     "n": pa.array(n, pa.int64())})


@ray.remote
def _block_conv_total(tbl: pa.Table) -> int:
    import pyarrow.compute as pc
    return int(pc.sum(tbl.column("n")).as_py() or 0)


@ray.remote
def _block_conv_offsets(tbl: pa.Table, base: int) -> pa.Table:
    n = tbl.column("n").to_numpy()
    off = base + np.concatenate(([0], np.cumsum(n)[:-1])).astype(np.int64)
    return pa.table({"conv_id": tbl.column("conv_id"),
                     "base": pa.array(off, pa.int64())})


def conversation_offsets_ds(ds: "ray.data.Dataset") \
        -> tuple["ray.data.Dataset", int]:
    """DISTRIBUTED O1/O2: per-conversation docID offsets as a
    (conv_id, base) Dataset — no corpus-sized (or conv-sized) driver
    structure anywhere.

    per-block combiner -> hash groupby per conv (validates density) ->
    distributed sort by conv_id -> per-block totals (one int per block
    on the driver) -> per-block prefix-sum tasks.  Raw Ray tasks are
    used ONLY for the prefix sums, which the Dataset API cannot express;
    everything is O(blocks) on the driver.
    """
    from ray.data.aggregate import Max, Min, Sum
    conv = (ds.select_columns(["conv_id", "turn_idx"])
            .map_batches(_partial_conv_counts, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby("conv_id")
            .aggregate(Sum("n"), Min("mn"), Max("mx"), Sum("nd"),
                       Sum("s"), Sum("s2"))
            .map_batches(_validate_conv_agg, batch_format="pyarrow",
                         zero_copy_batch=True))
    conv_sorted = conv.sort("conv_id").materialize()
    refs = conv_sorted.to_arrow_refs()
    if not refs:
        return ray.data.from_arrow(pa.table(
            {"conv_id": pa.array([], pa.string()),
             "base": pa.array([], pa.int64())})), 0
    totals = ray.get([_block_conv_total.remote(r) for r in refs])
    bases = np.concatenate(([0], np.cumsum(totals)[:-1])).astype(np.int64)
    out_refs = [_block_conv_offsets.remote(r, int(b))
                for r, b in zip(refs, bases)]
    return ray.data.from_arrow_refs(out_refs), int(sum(totals))


def assign_doc_ids_join(ds: "ray.data.Dataset",
                        offsets_ds: "ray.data.Dataset",
                        num_partitions: int | None = None) -> "ray.data.Dataset":
    """Distributed docID assignment: hash-join turns with the offsets
    table on conv_id (both sides shuffled by the SAME key), then
    doc_id = base + turn_idx per row.  Replaces the whole-offsets-dict
    broadcast, which is a driver OOM at ~10^10 conversations."""
    if num_partitions is None:
        n = max(1, int(ray.cluster_resources().get("CPU", 4)))
        num_partitions = max(8, n // 2)
    joined = ds.join(offsets_ds, join_type="inner",
                     num_partitions=num_partitions, on=("conv_id",))

    def add_doc_id(batch: pa.Table) -> pa.Table:
        doc_id = batch.column("base").to_numpy() + \
            batch.column("turn_idx").to_numpy().astype(np.int64)
        return batch.drop_columns(["base"]).append_column(
            "doc_id", pa.array(doc_id, pa.int64()))

    return joined.map_batches(add_doc_id, batch_format="pyarrow",
                              zero_copy_batch=True)


def make_assign_doc_ids(offsets_ref):
    """map_batches fn adding doc_id = conv_offset[conv_id] + turn_idx."""

    def assign(batch: pa.Table) -> pa.Table:
        offsets = ray.get(offsets_ref) if isinstance(offsets_ref, ray.ObjectRef) \
            else offsets_ref
        conv = batch.column("conv_id").to_pandas()
        base = conv.map(offsets).to_numpy(dtype=np.int64)
        doc_id = base + batch.column("turn_idx").to_numpy().astype(np.int64)
        return batch.append_column("doc_id", pa.array(doc_id, pa.int64()))

    return assign


# --- doc_table (T2) ------------------------------------------------------


def doc_table_batch(batch: pa.Table) -> pa.Table:
    """T2 metadata pass — text bytes preserved untouched (M1 invariant).
    doc_len is NOT computed here: A1 emits it as the DL_SENTINEL posting
    run, so the corpus is tokenized exactly once."""
    return batch


# --- G6: hot-term detection ---------------------------------------------


def detect_hot_terms_from_parquet(path: str, cfg: EngineConfig) -> set[str]:
    """Small-input fast path for G6: read the first hot_sample_docs rows
    (lexicographic file order — deterministic) on the driver, no Ray job.
    The sample definition differs from the Dataset path (first rows vs
    doc_id < n) but both are pinned, deterministic heuristics."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as _pq

    from web_search_engine_ray.spec import TOKEN_RE
    files = sorted(_glob.glob(_os.path.join(path, "*.parquet"))) \
        if _os.path.isdir(path) else [path]
    df_counts: dict[str, int] = {}
    seen = 0
    for f in files:
        if seen >= cfg.hot_sample_docs:
            break
        for rb in _pq.ParquetFile(f).iter_batches(columns=["text"],
                                                  batch_size=8192):
            for txt in rb.column(0).to_pylist():
                for t in set(TOKEN_RE.findall(txt.lower())):
                    df_counts[t] = df_counts.get(t, 0) + 1
                seen += 1
                if seen >= cfg.hot_sample_docs:
                    break
            if seen >= cfg.hot_sample_docs:
                break
    if seen == 0:
        return set()
    threshold = cfg.hot_df_ratio * seen
    return {t for t, c in df_counts.items() if c > threshold}


def detect_hot_terms(corpus_ds: "ray.data.Dataset", cfg: EngineConfig,
                     n_docs: int) -> set[str]:
    """Deterministic sample df: docs with doc_id < sample_n (stable under
    any block order).  Terms with sample-df/sample_n > hot_df_ratio are
    'hot' and get doc-range salted in the merge (SURVEY.md §4.3)."""
    sample_n = min(cfg.hot_sample_docs, n_docs)
    if sample_n == 0:
        return set()
    from web_search_engine_ray.spec import TOKEN_RE
    sample = corpus_ds.filter(
        expr=f"doc_id < {sample_n}").select_columns(["doc_id", "text"])
    df_counts: dict[str, int] = {}
    for batch in sample.iter_batches(batch_format="pyarrow", batch_size=4096):
        for text in batch.column("text").to_pylist():
            for t in set(TOKEN_RE.findall(text.lower())):
                df_counts[t] = df_counts.get(t, 0) + 1
    threshold = cfg.hot_df_ratio * sample_n
    return {t for t, c in df_counts.items() if c > threshold}


# --- A1: partial-posting emitter (actor pool) ---------------------------


class PartitionIndexer:
    """Tokenize turns -> partial postings (doc_id, term, tf, bucket, salt).

    State (hot-term set, salt range size, term→bucket cache) is built
    once per worker.  Two execution forms, same class:

    - task form (default, ``partition_indexer_task``): plain map_batches
      tasks with a per-worker-process singleton — identical state reuse,
      none of the actor-pool startup/ramp cost (measured 3x faster on a
      32-CPU stage whose lifetime is seconds);
    - actor-pool form (``map_batches(PartitionIndexer, concurrency=N)``)
      for long-lived builds where the pool amortizes (the BASELINE.json
      actor-pool pattern; cfg.indexer_actor_pool=True).

    Emits per-batch partials; the true combine is the merge shuffle
    (SURVEY.md §2.3 note).
    """

    def __init__(self, hot_terms_ref, num_buckets: int, salt_s: int, n_docs: int):
        self.hot = (ray.get(hot_terms_ref)
                    if isinstance(hot_terms_ref, ray.ObjectRef) else hot_terms_ref)
        self.num_buckets = num_buckets
        self.salt_s = max(1, salt_s)
        self.n_docs = max(1, n_docs)
        self._bucket_cache: dict[str, int] = {}

    def _buckets_for(self, uniques: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        cache = self._bucket_cache
        bk = np.empty(len(uniques), dtype=np.int32)
        hot = np.zeros(len(uniques), dtype=bool)
        for i, t in enumerate(uniques):
            b = cache.get(t)
            if b is None:
                b = term_bucket(t, self.num_buckets)
                cache[t] = b
            bk[i] = b
            hot[i] = t in self.hot
        return bk, hot

    _WORKER_CACHE: dict = {}

    @classmethod
    def task_fn(cls, batch: pa.Table, *, hot_ref, num_buckets: int,
                salt_s: int, n_docs: int) -> pa.Table:
        """Per-worker-process singleton wrapper (task execution form)."""
        key = (str(hot_ref) if isinstance(hot_ref, ray.ObjectRef)
               else id(hot_ref), num_buckets, salt_s, n_docs)
        inst = cls._WORKER_CACHE.get(key)
        if inst is None:
            cls._WORKER_CACHE.clear()
            inst = cls._WORKER_CACHE[key] = cls(
                hot_ref, num_buckets, salt_s, n_docs)
        return inst(batch)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Emit per-batch ENCODED posting runs (the in-memory mini index
        of this partition, varbyte-compressed) — one row per (term,
        salt) present in the batch, SEGMENT_SCHEMA.  The merge shuffle
        therefore moves ~2 B/posting instead of ~25 B/posting rows."""
        from web_search_engine_ray.functions.codec import encode_runs
        from web_search_engine_ray.stages.encoder import (SEGMENT_SCHEMA,
                                                          _empty_cols)
        doc_ids, terms, tfs, _dls = batch_postings(
            batch.column("doc_id").to_numpy(), batch.column("text").to_pylist())
        if len(doc_ids) == 0:
            return pa.table(_empty_cols(), schema=SEGMENT_SCHEMA)
        codes, uniques = pd.factorize(np.asarray(terms, dtype=object))
        ubk, uhot = self._buckets_for(uniques)
        # doc-length sentinel: one pseudo-posting per doc, tf = doc_len —
        # always doc-range salted (it is the ultimate hot term)
        from web_search_engine_ray.spec import DL_SENTINEL, term_bucket
        first = np.unique(doc_ids, return_index=True)[1]
        dl_docs = doc_ids[first]
        dl_vals = _dls[first]
        codes = np.concatenate((codes, np.full(len(dl_docs), len(uniques))))
        uniques = np.concatenate((uniques, [DL_SENTINEL]))
        ubk = np.concatenate((ubk, [term_bucket(DL_SENTINEL,
                                                self.num_buckets)])) \
            .astype(np.int32)
        uhot = np.concatenate((uhot, [True]))
        doc_ids = np.concatenate((doc_ids, dl_docs))
        tfs = np.concatenate((tfs, dl_vals))
        salts = np.zeros(len(doc_ids), dtype=np.int32)
        hot_rows = uhot[codes]
        if hot_rows.any():
            salts[hot_rows] = (doc_ids[hot_rows] * self.salt_s
                               // self.n_docs).astype(np.int32)
        # term-major layout: runs are (code, salt) groups, docs ascending
        order = np.lexsort((doc_ids, salts, codes))
        codes_s = codes[order]
        salts_s = salts[order]
        docs_s = doc_ids[order]
        tfs_s = tfs[order]
        change = np.flatnonzero((codes_s[1:] != codes_s[:-1])
                                | (salts_s[1:] != salts_s[:-1])) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(codes_s)]))
        enc = encode_runs(docs_s, tfs_s, starts, ends)
        run_codes = codes_s[starts]
        return pa.table({
            "term": pa.array(uniques[run_codes], pa.string()),
            "bucket": pa.array(ubk[run_codes], pa.int32()),
            "salt": pa.array(salts_s[starts], pa.int32()),
            "df": pa.array(enc["n"], pa.int64()),
            "cf": pa.array(enc["cf"], pa.int64()),
            "n": pa.array(enc["n"], pa.int64()),
            "first_doc": pa.array(enc["first_doc"], pa.int64()),
            "last_doc": pa.array(enc["last_doc"], pa.int64()),
            "max_tf": pa.array(enc["max_tf"].astype(np.int32), pa.int32()),
            "doc_bytes": pa.array(enc["doc_bytes"], pa.large_binary()),
            "tf_bytes": pa.array(enc["tf_bytes"], pa.large_binary()),
            "block_last_doc": pa.array(enc["block_last_doc"],
                                       pa.list_(pa.int64())),
            "block_max_tf": pa.array(enc["block_max_tf"],
                                     pa.list_(pa.int32())),
            "block_off_docs": pa.array(enc["block_off_docs"],
                                       pa.list_(pa.int64())),
            "block_off_tfs": pa.array(enc["block_off_tfs"],
                                      pa.list_(pa.int64())),
        }, schema=SEGMENT_SCHEMA)
