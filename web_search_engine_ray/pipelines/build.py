"""E1 — build_index: the flagship pipeline (SURVEY.md §3).

    read -> validate -> docID (conv prefix sums) -> doc_table ->
    stats -> hot terms -> partial postings (A1 actor pool) ->
    [checkpoint partials] -> groupby merge+encode -> per-bucket
    segment/dictionary files + stats/manifest sidecars.

Every stage streams through Ray Data; the only driver-side
materializations are the conversation table (offsets), the hot-term
sample, and per-bucket manifest rows.  Stage boundaries are parquet
checkpoints recorded in the manifest — a resumed build skips completed
stages (T-RES, SURVEY.md §5.3).
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa

import ray
import ray.data

from web_search_engine_ray.spec import DEFAULT_CONFIG, EngineConfig
from web_search_engine_ray.sources.transcripts import read_transcripts
from web_search_engine_ray.stages.indexer import (
    PartitionIndexer, conversation_offsets, detect_hot_terms,
    doc_table_batch, make_assign_doc_ids)
from web_search_engine_ray.stages.encoder import (FinalizeBucket,  # noqa: F401
                                                  encode_partition,
                                                  finalize_buckets_task)
from web_search_engine_ray.state.manifest import Manifest, write_stats

DOC_TABLE_DIR = "doc_table"
PARTIALS_DIR = "partials"
SEGMENTS_DIR = "segments"
DICT_DIR = "dictionary"


def dedup_turns(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """D1: drop duplicate (conv_id, turn_idx), keeping the earliest by ts
    (tie: stable first).  Hash partition on (conv_id, turn_idx) + ONE
    vectorized pass per partition (sort + run-first selection) — group
    payload is the duplicate copies of one turn, so partition size is
    bounded by turns × duplication factor, and there is no per-group
    Python call (functions/grouping.py pattern)."""
    import numpy as np

    from web_search_engine_ray.functions.grouping import (group_slices,
                                                          hash_partition)

    def first_by_ts_partition(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= 1:
            return batch
        idx = pa.compute.sort_indices(batch, sort_keys=[
            ("conv_id", "ascending"), ("turn_idx", "ascending"),
            ("ts", "ascending")])
        t = batch.take(idx)
        # run detection only needs equal/not-equal of adjacent rows:
        # dictionary codes give that without materializing Python strs
        enc = pa.compute.dictionary_encode(
            t.column("conv_id")).combine_chunks()
        conv = np.asarray(enc.indices.to_numpy(zero_copy_only=False),
                          np.int64)
        turn = t.column("turn_idx").to_numpy()
        starts, _ends = group_slices([conv, turn])
        return t.take(pa.array(starts, pa.int64()))

    return hash_partition(ds, ["conv_id", "turn_idx"]).map_batches(
        first_by_ts_partition, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True)


def filter_turns(ds: "ray.data.Dataset", expr: str) -> "ray.data.Dataset":
    """M4: index scoping (e.g. "role != 'tool'" or a ts range) before
    docID assignment — a J3-style scoped index view."""
    return ds.filter(expr=expr)


_SMALL_INPUT_ROWS = 20_000_000


def _parquet_num_rows(path: str) -> int:
    import glob
    import pyarrow.parquet as pq
    files = sorted(glob.glob(os.path.join(path, "*.parquet"))) \
        if os.path.isdir(path) else [path]
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def transcripts_to_corpus(ds: "ray.data.Dataset",
                          path: str | None = None,
                          cfg: EngineConfig = DEFAULT_CONFIG) -> "ray.data.Dataset":
    """Assign deterministic dense doc_id (O1/O2) to a transcripts Dataset.

    Three equivalent forms (all validate dense turn_idx, all yield the
    identical (conv_id asc, turn_idx asc) enumeration):
    - small parquet input (metadata row count): conv reduce driver-side
      (cheaper than a Ray job) + broadcast offsets dict;
    - small non-parquet Dataset: conv reduce via iter_batches combine +
      broadcast offsets dict;
    - large input or cfg.docid_distributed: DISTRIBUTED offsets Dataset
      (sort + per-block prefix sums) hash-JOINED back on conv_id — no
      conv-sized driver structure
      (stages/indexer.py:conversation_offsets_ds).
    """
    from web_search_engine_ray.stages.indexer import (
        assign_doc_ids_join, conversation_offsets_ds,
        conversation_offsets_from_parquet)
    small_parquet = (path is not None and
                     _parquet_num_rows(path) <= cfg.docid_small_input_rows)
    if cfg.docid_distributed or (path is not None and not small_parquet):
        offsets_ds, _n = conversation_offsets_ds(ds)
        return assign_doc_ids_join(ds, offsets_ds)
    if small_parquet:
        offsets, _n = conversation_offsets_from_parquet(path)
    else:
        offsets, _n = conversation_offsets(ds)
    offsets_ref = ray.put(offsets)
    return ds.map_batches(make_assign_doc_ids(offsets_ref),
                          batch_format="pyarrow", zero_copy_batch=True)


def build_index(corpus: "ray.data.Dataset | str", out_dir: str,
                cfg: EngineConfig = DEFAULT_CONFIG, *,
                input_kind: str = "transcripts",
                filter_expr: str | None = None,
                dedup: bool = False,
                resume: bool = False) -> dict:
    """Build the inverted index at ``out_dir``.

    corpus: path to transcript parquet (input_kind="transcripts"),
    path to a (doc_id, text, ...) parquet (input_kind="corpus"), or a
    Dataset already carrying doc_id + text.
    Returns the stats dict (T5).
    """
    import time as _time
    os.makedirs(out_dir, exist_ok=True)
    man = Manifest.load_or_create(out_dir, cfg.config_hash(), resume)
    # a prior run with checkpoint_partials=False has no persisted
    # partials to resume the merge from: treat the stage as not-done so
    # the restart re-derives them (restart-from-scratch is the
    # documented trade of skipping the checkpoint)
    _p = man.data["stages"].get("partials", {})
    if _p.get("done") and not _p.get("checkpointed", True) \
            and not man.done("segments"):
        del man.data["stages"]["partials"]
    _t0 = _time.time()
    _metrics: dict[str, float] = {}

    def _mark(stage: str) -> None:
        nonlocal _t0
        _metrics[stage] = round(_time.time() - _t0, 3)
        _t0 = _time.time()

    # One lazy Dataset, consumed by several stages — conv offsets are
    # computed once (memoized; skipped entirely when resuming past the
    # text-consuming stages); re-execution only re-runs cheap read+assign.
    _cache: list = []

    def corpus_ds() -> "ray.data.Dataset":
        if not _cache:
            ds = read_transcripts(corpus) if isinstance(corpus, str) else corpus
            plain_path = (corpus if isinstance(corpus, str)
                          and not filter_expr and not dedup else None)
            if filter_expr:
                ds = filter_turns(ds, filter_expr)
            if dedup:
                ds = dedup_turns(ds)
            if input_kind == "transcripts":
                ds = transcripts_to_corpus(ds, path=plain_path, cfg=cfg)
            _cache.append(ds)
        return _cache[0]

    # -- overlapped fresh build (scheduling-only optimization) ------------
    # On the flagship plain path (string transcripts input, no filter /
    # dedup, fresh manifest), the doc_table write is independent of the
    # partials -> merge chain, and the partials CHECKPOINT write is
    # independent of the merge that consumes the same materialized
    # blocks.  Run both concurrently: outputs are byte-identical to the
    # sequential path (same assign fn, same encode, same finalize); only
    # task scheduling changes.  Stages are marked done strictly after
    # their own writes complete, so a mid-build failure resumes cleanly
    # (at worst it redoes work the sequential path would have kept).
    doc_dir = os.path.join(out_dir, DOC_TABLE_DIR)
    overlap_ok = (
        cfg.overlap_build_stages and isinstance(corpus, str)
        and input_kind == "transcripts" and not filter_expr and not dedup
        and cfg.materialize_partials
        and cfg.merge_strategy == "direct"
        and not any(man.done(s) for s in (
            "doc_table", "stats", "hot_terms", "partials", "segments"))
        and 0 < _parquet_num_rows(corpus) <= cfg.docid_small_input_rows)
    if overlap_ok:
        _overlapped_fresh_build(corpus, out_dir, cfg, man, _metrics)

    # -- stage: doc_table -------------------------------------------------
    if not man.done("doc_table"):
        _clean(doc_dir)
        # pure metadata+text pass: doc_len lives in the DL_SENTINEL
        # posting list (A1), so this pass never tokenizes
        corpus_ds().write_parquet(doc_dir, compression="zstd")
        _mark("doc_table")
        man.mark_done("doc_table")

    # -- stage: precounts (n_docs / max_doc_id — doc-length stats come
    # from the DL_SENTINEL posting list after the merge) ------------------
    if not man.done("stats"):
        if not os.path.exists(doc_dir):   # empty corpus: no files written
            agg = {"count()": 0, "max(doc_id)": -1}
        elif _parquet_num_rows(doc_dir) <= _SMALL_INPUT_ROWS:
            import pyarrow.dataset as pads
            ids = pads.dataset(doc_dir, format="parquet").to_table(
                columns=["doc_id"]).column("doc_id").to_numpy()
            agg = {"count()": len(ids),
                   "max(doc_id)": int(ids.max()) if len(ids) else -1}
        else:
            from ray.data.aggregate import Count, Max
            agg = ray.data.read_parquet(doc_dir, columns=["doc_id"]) \
                .aggregate(Count(), Max("doc_id"))
        stats = {
            "n_docs": int(agg["count()"]),
            "max_doc_id": (-1 if agg["max(doc_id)"] is None
                           else int(agg["max(doc_id)"])),
            "num_buckets": cfg.num_buckets,
            "salt_s": cfg.salt_s,
            "block_size": cfg.block_size,
            "k1": cfg.k1,
            "b": cfg.b,
            "config_hash": cfg.config_hash(),
        }
        _mark("stats")
        man.mark_done("stats", **stats)
    stats = {k: v for k, v in man.data["stages"]["stats"].items() if k != "done"}
    n_docs = stats["n_docs"]

    # -- stage: hot terms (G6) --------------------------------------------
    if not man.done("hot_terms"):
        if isinstance(corpus, str) and not filter_expr and not dedup:
            from web_search_engine_ray.stages.indexer import \
                detect_hot_terms_from_parquet
            hot = sorted(detect_hot_terms_from_parquet(corpus, cfg))
        else:
            hot = sorted(detect_hot_terms(corpus_ds(), cfg, n_docs))
        _mark("hot_terms")
        man.mark_done("hot_terms", hot_terms=hot)
    hot_terms = set(man.data["stages"]["hot_terms"]["hot_terms"])

    # -- stage: partial postings (A1) + checkpoint ------------------------
    partials_dir = os.path.join(out_dir, PARTIALS_DIR)
    hot_ref = ray.put(hot_terms)
    live_partials = None
    if not man.done("partials"):
        indexer_kwargs = dict(hot_ref=hot_ref, num_buckets=cfg.num_buckets,
                              salt_s=cfg.salt_s,
                              n_docs=max(1, stats["max_doc_id"] + 1))
        # read the checkpointed doc_table (doc_id already assigned,
        # column-pruned to the two indexing columns) instead of
        # re-scanning + re-assigning the raw corpus — one corpus scan
        # saved per build, and the partials stage becomes a pure
        # (read -> tokenize -> encode) pipeline
        if os.path.exists(doc_dir) and \
                os.environ.get("WSE_PARTIALS_FROM_DOCTABLE", "1") != "0":
            src = ray.data.read_parquet(doc_dir, columns=["doc_id", "text"])
        else:  # empty corpus: no doc_table files were written
            src = corpus_ds().select_columns(["doc_id", "text"])
        if cfg.indexer_actor_pool:
            partials = src.map_batches(
                PartitionIndexer,
                fn_constructor_args=tuple(indexer_kwargs.values()),
                batch_format="pyarrow", zero_copy_batch=True,
                batch_size=cfg.tokenize_batch_size,
                concurrency=_actor_concurrency())
        else:
            partials = src.map_batches(
                PartitionIndexer.task_fn, fn_kwargs=indexer_kwargs,
                batch_format="pyarrow", zero_copy_batch=True,
                batch_size=cfg.tokenize_batch_size)
        if cfg.checkpoint_partials:
            # Materialize once: the checkpoint write and the merge both
            # consume the same in-memory blocks (object store spills if
            # needed).  At true 10^12 scale flip materialize_partials
            # off: stream to the checkpoint, then merge re-reads it.
            _clean(partials_dir)
            if cfg.materialize_partials:
                live_partials = partials.materialize()
                live_partials.write_parquet(partials_dir, compression="zstd")
            else:
                partials.write_parquet(partials_dir, compression="zstd")
            _mark("partials")
            man.mark_done("partials", checkpointed=True)
        else:
            live_partials = partials
            man.mark_done("partials", checkpointed=False)

    # -- stage: merge + encode + write segments (G3/A2/S3) ----------------
    # HASH_SHUFFLE repartition by (bucket, salt): a streaming hash
    # exchange — never a global sort of the posting rows.
    if not man.done("segments"):
        if live_partials is not None:
            partials_ds = live_partials
        else:
            partials_ds = ray.data.read_parquet(partials_dir)
        completed = {int(b) for b in man.data.get("buckets", {})}
        if completed:
            keep = [b for b in range(cfg.num_buckets) if b not in completed]
            partials_ds = partials_ds.filter(expr=f"bucket in {keep}")
        seg_dir = os.path.join(out_dir, SEGMENTS_DIR)
        dict_dir = os.path.join(out_dir, DICT_DIR)
        if not completed:  # fresh merge: drop any stale bucket files,
            _clean(seg_dir)  # and any sharded re-shard of the OLD dict
            _clean(dict_dir)
            from web_search_engine_ray.stages.scorer import \
                SHARDED_DICT_DIRNAME
            _clean(os.path.join(out_dir, SHARDED_DICT_DIRNAME))
        n_cpus = max(1, int(ray.cluster_resources().get("CPU", 4)))
        if cfg.merge_strategy == "direct":
            # raw-task hash exchange: same semantics, no aggregator-actor
            # coordination cost (see stages/exchange.py for the rationale
            # and when to prefer the Dataset hash-shuffle instead)
            from ray.data.dataset import MaterializedDataset

            from web_search_engine_ray.stages.exchange import direct_merge
            if not isinstance(partials_ds, MaterializedDataset):
                partials_ds = partials_ds.materialize()
            bucket_rows = direct_merge(partials_ds, seg_dir, dict_dir,
                                       cfg.salt_s, n_cpus)
        else:
            from ray.data.context import ShuffleStrategy
            partials_ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
            # cap aggregator actors so the two shuffle operators never
            # starve each other or the map tasks (deadlock otherwise)
            partials_ds.context.max_hash_shuffle_aggregators = \
                max(2, n_cpus // 4)
            bucket_rows = (
                partials_ds
                .repartition(num_blocks=max(8, n_cpus * 2),
                             keys=["bucket", "salt"])
                .map_batches(encode_partition, batch_size=None,
                             batch_format="pyarrow", zero_copy_batch=True)
                .repartition(num_blocks=min(cfg.num_buckets, max(4, n_cpus)),
                             keys=["bucket"])
                .map_batches(finalize_buckets_task,
                             fn_kwargs=dict(seg_dir=seg_dir,
                                            dict_dir=dict_dir),
                             batch_size=None, batch_format="pyarrow",
                             zero_copy_batch=True)
                .take_all()
            )
        _mark("segments")
        man.record_buckets(bucket_rows)
        man.mark_done("segments", n_buckets=len(man.data["buckets"]))

    # -- stage: finalize sidecars (doc-length stats come from the
    # DL_SENTINEL bucket row recorded by the merge) -----------------------
    if not man.done("finalize"):
        dl_sum = 0
        dl_min = 0
        for b in man.data["buckets"].values():
            if b.get("dl_sum"):
                dl_sum = int(b["dl_sum"])
                dl_min = int(b["dl_min"])
                break
        stats["total_tokens"] = dl_sum
        stats["avgdl"] = (dl_sum / n_docs) if n_docs else 0.0
        stats["dl_min"] = max(1, dl_min)
        write_stats(out_dir, stats)
        man.mark_done("finalize", stage_seconds=_metrics,
                      total_tokens=dl_sum, avgdl=stats["avgdl"],
                      dl_min=stats["dl_min"])
    else:
        fin = man.data["stages"]["finalize"]
        stats["total_tokens"] = fin["total_tokens"]
        stats["avgdl"] = fin["avgdl"]
        stats["dl_min"] = fin["dl_min"]
    stats["stage_seconds"] = _metrics
    return stats


def _fused_index_and_doc_write(batch: "pa.Table", *, hot_ref,
                               num_buckets: int, salt_s: int, n_docs: int,
                               doc_dir: str, sub_batch: int) -> "pa.Table":
    """One-pass A1: write this block's doc_table shard (atomic
    tmp+rename, named by the block's min doc_id — doc_ids are disjoint
    across blocks, so names are unique and a retried task rewrites the
    SAME file with the same bytes), then tokenize+encode the block into
    posting runs.  The corpus flows through memory exactly once.

    Tokenize runs over ``sub_batch``-row zero-copy slices, not the
    whole block: the per-slice token object array stays cache-sized
    (a whole-block factorize measured ~35% slower on this box)."""
    import pyarrow.parquet as pq

    from web_search_engine_ray.stages.indexer import PartitionIndexer
    if batch.num_rows:
        os.makedirs(doc_dir, exist_ok=True)
        lo = int(pa.compute.min(batch.column("doc_id")).as_py())
        path = os.path.join(doc_dir, f"fused-{lo:012d}.parquet")
        tmp = f"{path}.tmp{os.getpid()}"
        pq.write_table(batch, tmp, compression="zstd")
        os.replace(tmp, path)
    skinny = batch.select(["doc_id", "text"])
    parts = [PartitionIndexer.task_fn(
        skinny.slice(off, sub_batch), hot_ref=hot_ref,
        num_buckets=num_buckets, salt_s=salt_s, n_docs=n_docs)
        for off in range(0, max(1, skinny.num_rows), sub_batch)]
    return pa.concat_tables(parts)


def _overlapped_fresh_build(corpus: str, out_dir: str, cfg: EngineConfig,
                            man: Manifest, metrics: dict) -> None:
    """Fresh plain-path build with stage overlap (see build_index).

    Concurrency structure (threads only drive Ray pipelines; all heavy
    work is in Ray tasks, which fair-share the CPUs because A1 runs in
    task form on this path):

        offsets + hot_terms (driver, ~1 s)
        ├── thread: read -> assign -> write doc_table (zstd)
        └── main:   read -> assign -> A1 tokenize+encode -> materialize
                    ├── thread: write partials checkpoint (zstd)
                    └── main:   direct_merge -> segments + dictionary
        join all; mark stages done (each strictly after its write)

    With cfg.fuse_doc_table (default, task-form A1 only) the first two
    legs FUSE: one pipeline reads the corpus once, each task writing
    its block's doc_table shard as a side-effect and emitting posting
    runs — the corpus crosses the memory bus once instead of three
    times (write + re-read + tokenize).  Measured on this box the bus
    is the binding resource at 32 CPUs (aggregate stream bandwidth
    saturates at ~40 GB/s by 8 processes), so the fusion buys the most
    exactly where scaling was capped.
    """
    import threading
    import time as _time

    from web_search_engine_ray.stages.exchange import direct_merge
    from web_search_engine_ray.stages.indexer import (
        conversation_offsets_from_parquet, detect_hot_terms_from_parquet)

    # offsets and the hot-term sample are independent driver-side
    # parquet passes (~1-2 s each); parquet decode releases the GIL, so
    # a thread overlaps them — this is pure serial time at every
    # parallelism level (Amdahl), worth its own thread
    hot_box: list = []
    hot_errs: list[BaseException] = []
    t_hot0 = _time.time()

    def _hot_target():
        try:
            hot_box.append(sorted(detect_hot_terms_from_parquet(corpus, cfg)))
        except BaseException as e:      # re-raised at join, not an
            hot_errs.append(e)          # IndexError on hot_box[0]

    th_hot = threading.Thread(target=_hot_target, daemon=True)
    t0 = _time.time()
    th_hot.start()
    offsets, n_docs = conversation_offsets_from_parquet(corpus)
    offsets_ref = ray.put(offsets)
    metrics["offsets"] = round(_time.time() - t0, 3)

    from web_search_engine_ray.stages.scorer import SHARDED_DICT_DIRNAME
    doc_dir = os.path.join(out_dir, DOC_TABLE_DIR)
    partials_dir = os.path.join(out_dir, PARTIALS_DIR)
    seg_dir = os.path.join(out_dir, SEGMENTS_DIR)
    dict_dir = os.path.join(out_dir, DICT_DIR)
    for d in (doc_dir, partials_dir, seg_dir, dict_dir,
              os.path.join(out_dir, SHARDED_DICT_DIRNAME)):
        _clean(d)

    errs: list[BaseException] = []

    def _run(label: str, fn) -> threading.Thread:
        def _target():
            t = _time.time()
            try:
                fn()
            except BaseException as e:   # re-raised on the main thread
                errs.append(e)
            metrics[label] = round(_time.time() - t, 3)
        th = threading.Thread(target=_target, daemon=True)
        th.start()
        return th

    fuse = cfg.fuse_doc_table and not cfg.indexer_actor_pool
    if fuse:
        # ONE corpus pass: read -> assign -> (doc shard write + A1).
        # hot_terms must finish first (it feeds A1's salt decisions);
        # it has been running alongside the offsets pass since t0.
        th_hot.join()
        if hot_errs:
            raise hot_errs[0]
        hot = hot_box[0]
        metrics["hot_terms"] = round(_time.time() - t_hot0, 3)
        t1 = _time.time()
        fused_kwargs = dict(hot_ref=ray.put(set(hot)),
                            num_buckets=cfg.num_buckets, salt_s=cfg.salt_s,
                            n_docs=max(1, n_docs), doc_dir=doc_dir,
                            sub_batch=cfg.tokenize_batch_size)
        partials = read_transcripts(corpus).map_batches(
            make_assign_doc_ids(offsets_ref), batch_format="pyarrow",
            zero_copy_batch=True).map_batches(
            _fused_index_and_doc_write, fn_kwargs=fused_kwargs,
            batch_size=None, batch_format="pyarrow", zero_copy_batch=True)
        live = partials.materialize()
        metrics["doc_table"] = 0.0        # fused into partials
        metrics["partials"] = round(_time.time() - t1, 3)
    else:
        # doc_table write (a Ray job) runs while the DRIVER computes the
        # hot-term sample — driver-side pandas/regex work that would
        # otherwise serialize after the write.  Never two CPU-heavy Ray
        # pipelines at once: measured on this box, concurrent full
        # pipelines oversubscribe the cores and run slower than
        # sequential.
        def _write_doc_table():
            read_transcripts(corpus).map_batches(
                make_assign_doc_ids(offsets_ref), batch_format="pyarrow",
                zero_copy_batch=True).write_parquet(doc_dir,
                                                    compression="zstd")

        th_doc = _run("doc_table", _write_doc_table)
        th_hot.join()                       # running since t0
        if hot_errs:
            raise hot_errs[0]
        hot = hot_box[0]
        metrics["hot_terms"] = round(_time.time() - t_hot0, 3)
        th_doc.join()
        if errs:
            raise errs[0]

        # partials read the checkpointed doc_table (column-pruned,
        # doc_id already assigned) — one corpus scan and one assign
        # pass saved
        t1 = _time.time()
        indexer_kwargs = dict(hot_ref=ray.put(set(hot)),
                              num_buckets=cfg.num_buckets,
                              salt_s=cfg.salt_s, n_docs=max(1, n_docs))
        src = ray.data.read_parquet(doc_dir, columns=["doc_id", "text"])
        if cfg.indexer_actor_pool:
            partials = src.map_batches(
                PartitionIndexer,
                fn_constructor_args=tuple(indexer_kwargs.values()),
                batch_format="pyarrow", zero_copy_batch=True,
                batch_size=cfg.tokenize_batch_size,
                concurrency=_actor_concurrency())
        else:
            partials = src.map_batches(
                PartitionIndexer.task_fn, fn_kwargs=indexer_kwargs,
                batch_format="pyarrow", zero_copy_batch=True,
                batch_size=cfg.tokenize_batch_size)
        live = partials.materialize()
        metrics["partials"] = round(_time.time() - t1, 3)

    # the checkpoint write (IO-bound) overlaps the merge (CPU-bound);
    # both consume the same materialized blocks.  When the caller opts
    # out of mid-build resumability (cfg.checkpoint_partials=False) the
    # write is skipped entirely — on a bus-bound host that is one fewer
    # corpus-sized crossing (compress + copy) competing with the merge
    th_ckpt = None
    if cfg.checkpoint_partials:
        th_ckpt = _run("partials_ckpt",
                       lambda: live.write_parquet(partials_dir,
                                                  compression="zstd"))
    t2 = _time.time()
    n_cpus = max(1, int(ray.cluster_resources().get("CPU", 4)))
    bucket_rows = direct_merge(live, seg_dir, dict_dir, cfg.salt_s, n_cpus)
    metrics["segments"] = round(_time.time() - t2, 3)
    if th_ckpt is not None:
        th_ckpt.join()
    if errs:
        raise errs[0]

    man.mark_done("doc_table")
    stats = {
        "n_docs": int(n_docs),
        "max_doc_id": int(n_docs) - 1,    # dense 0..n-1 by construction
        "num_buckets": cfg.num_buckets,
        "salt_s": cfg.salt_s,
        "block_size": cfg.block_size,
        "k1": cfg.k1,
        "b": cfg.b,
        "config_hash": cfg.config_hash(),
    }
    man.mark_done("stats", **stats)
    man.mark_done("hot_terms", hot_terms=hot)
    man.mark_done("partials", checkpointed=cfg.checkpoint_partials)
    man.record_buckets(bucket_rows)
    man.mark_done("segments", n_buckets=len(man.data["buckets"]))


def _actor_concurrency() -> int:
    """Fixed-size actor pools: the autoscaling (1, n) form ramps up too
    slowly to saturate the machine within a stage's lifetime.  Leave two
    CPUs for the upstream read/write tasks, or the pool starves them and
    the pipeline deadlocks."""
    n = max(1, int(ray.cluster_resources().get("CPU", 4)))
    return max(1, n - 2)


def _clean(path: str) -> None:
    if os.path.exists(path):
        shutil.rmtree(path)
