"""Driver-facing reference queries (SURVEY.md §5.4, __ray_entry__ contract).

Each function takes ``sf_dir`` (a /root/testdata/sf* directory) and
returns a pyarrow Table; ``ORACLE_SQL`` holds the DuckDB-equivalent SQL
(column names match EXACTLY — the driver hashes values after sorting
columns by name).  The BM25 entries build a real index (memoized under
/tmp, reusing the engine's own resume machinery) — they exercise the
full E1+E2 path, not a shortcut reimplementation.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from web_search_engine_ray.pipelines.build import build_index
from web_search_engine_ray.pipelines.query import run_queries
from web_search_engine_ray.spec import EngineConfig, tokenize

# Pinned reference query set over the driver's `documents` table.
BM25_QUERIES: list[tuple[int, str]] = [
    (0, "spark hash join"),
    (1, "window agg stream"),
    (2, "customer order line"),
    (3, "slow query scan"),
    (4, "vector batch"),
    (5, "merge sort order"),
    (6, "big data table"),
    (7, "unseenterm spark"),
    (8, "filter"),
    (9, "key value part group"),
]
BM25_K = 10

_DOC_CFG = EngineConfig(hot_sample_docs=10_000)


def _documents_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "documents.parquet")


def index_for(sf_dir: str) -> str:
    """Build (or reuse via the manifest resume path) the documents index."""
    key = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    out = f"/tmp/wse_idx_{key}"
    build_index(_documents_path(sf_dir), out, _DOC_CFG,
                input_kind="corpus", resume=True)
    return out


def _docs_ds(sf_dir: str, columns=None) -> "ray.data.Dataset":
    return ray.data.read_parquet(_documents_path(sf_dir), columns=columns)


# --- engine-core queries -------------------------------------------------


def bm25_topk(sf_dir: str) -> pa.Table:
    idx = index_for(sf_dir)
    queries = pa.table({
        "query_id": pa.array([q[0] for q in BM25_QUERIES], pa.int64()),
        "query": pa.array([q[1] for q in BM25_QUERIES], pa.string())})
    res = run_queries(idx, queries, k=BM25_K, mode="wand")
    return res.set_column(res.schema.get_field_index("score"), "score",
                          pa.array(np.round(res.column("score").to_numpy(), 6)))


def merge_bm25(sf_dir: str) -> pa.Table:
    """Incremental indexing (pipelines/merge.py) under the exact BM25
    oracle: split `documents` at the median doc_id, build BASE and
    DELTA indexes independently (delta with local ids 0..n-1), fold the
    delta into the base with ``merge_indexes``, and serve the pinned
    query set over the MERGED index.  `documents.doc_id` is dense
    0..N-1, so the merge's append remapping (offset = base.max_doc_id+1
    = split point) reproduces the full build's docIDs exactly — the
    result must be byte-identical to ``bm25_topk`` and shares its SQL
    oracle, giving the merge path an end-to-end value-hash check."""
    from web_search_engine_ray.pipelines.merge import merge_indexes

    key = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = f"/tmp/wse_merge_{key}"
    merged = os.path.join(root, "merged")
    if not os.path.exists(os.path.join(merged, "stats.json")):
        docs = _docs_ds(sf_dir, ["doc_id", "text"])
        split = (int(pq.read_metadata(_documents_path(sf_dir)).num_rows)) // 2

        def _shift(batch: pa.Table, *, off: int) -> pa.Table:
            ids = pa.array(batch.column("doc_id").to_numpy() - off,
                           pa.int64())
            return batch.set_column(
                batch.schema.get_field_index("doc_id"), "doc_id", ids)

        base_ds = docs.filter(expr=f"doc_id < {split}")
        delta_ds = docs.filter(expr=f"doc_id >= {split}").map_batches(
            _shift, batch_format="pyarrow", fn_kwargs=dict(off=split))
        build_index(base_ds, os.path.join(root, "base"), _DOC_CFG,
                    input_kind="corpus", resume=True)
        build_index(delta_ds, os.path.join(root, "delta"), _DOC_CFG,
                    input_kind="corpus", resume=True)
        merge_indexes(os.path.join(root, "base"),
                      os.path.join(root, "delta"), merged)
    queries = pa.table({
        "query_id": pa.array([q[0] for q in BM25_QUERIES], pa.int64()),
        "query": pa.array([q[1] for q in BM25_QUERIES], pa.string())})
    res = run_queries(merged, queries, k=BM25_K, mode="wand")
    return res.set_column(res.schema.get_field_index("score"), "score",
                          pa.array(np.round(res.column("score").to_numpy(), 6)))


def doc_lengths(sf_dir: str) -> pa.Table:
    from web_search_engine_ray.pipelines.analysis import doc_tokens_batch
    ds = _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        doc_tokens_batch, batch_format="pyarrow", zero_copy_batch=True)
    return _collect(ds)


def corpus_stats(sf_dir: str) -> pa.Table:
    from web_search_engine_ray.state.manifest import read_stats
    idx = index_for(sf_dir)
    s = read_stats(idx)
    return pa.table({
        "n_docs": pa.array([s["n_docs"]], pa.int64()),
        "total_tokens": pa.array([s["total_tokens"]], pa.int64()),
        "avgdl": pa.array([round(s["avgdl"], 6)], pa.float64())})


def term_df(sf_dir: str) -> pa.Table:
    idx = index_for(sf_dir)
    d = pq.read_table(os.path.join(idx, "dictionary"),
                      columns=["term", "df", "cf"])
    return d.sort_by([("term", "ascending")])


def top_terms(sf_dir: str) -> pa.Table:
    tbl = term_df(sf_dir)
    return tbl.sort_by([("cf", "descending"), ("term", "ascending")]) \
        .slice(0, 25)


# --- training-data ops ---------------------------------------------------


def dedup_exact(sf_dir: str) -> pa.Table:
    from web_search_engine_ray.pipelines.analysis import exact_dedup
    out = exact_dedup(_docs_ds(sf_dir, ["doc_id", "text"]))
    return _collect(out).sort_by([("doc_id", "ascending")])


def fingerprint(sf_dir: str) -> pa.Table:
    from web_search_engine_ray.pipelines.analysis import fingerprint_batch
    ds = _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        fingerprint_batch, batch_format="pyarrow", zero_copy_batch=True)
    return _collect(ds).sort_by([("doc_id", "ascending")])


def quality_score(sf_dir: str) -> pa.Table:
    from web_search_engine_ray.pipelines.analysis import quality_batch
    ds = _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        quality_batch, batch_format="pyarrow", zero_copy_batch=True)
    return _collect(ds).select(
        ["doc_id", "n_tokens", "n_chars", "stopword_ratio"]) \
        .sort_by([("doc_id", "ascending")])


def lang_distribution(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Count
    agg = _docs_ds(sf_dir, ["doc_id", "lang"]).groupby("lang") \
        .aggregate(Count())
    tbl = _collect(agg)
    return pa.table({"lang": tbl.column("lang"),
                     "n_docs": tbl.column("count()")}) \
        .sort_by([("lang", "ascending")])


def lang_id_pred(sf_dir: str) -> pa.Table:
    from web_search_engine_ray.pipelines.analysis import lang_id_batch
    ds = _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        lang_id_batch, batch_format="pyarrow", zero_copy_batch=True)
    return _collect(ds).sort_by([("doc_id", "ascending")])


def dedup_minhash(sf_dir: str) -> pa.Table:
    from web_search_engine_ray.pipelines.analysis import near_dup_pairs
    return near_dup_pairs(_docs_ds(sf_dir, ["doc_id", "text"]),
                          _documents_path(sf_dir), threshold=0.8)


def dedup_simhash(sf_dir: str) -> pa.Table:
    from web_search_engine_ray.pipelines.analysis import simhash_pairs
    return simhash_pairs(_docs_ds(sf_dir, ["doc_id", "text"]), max_hamming=3)


def knn_cosine(sf_dir: str) -> pa.Table:
    from web_search_engine_ray.pipelines.knn import knn_bruteforce
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qtbl = pq.read_table(emb_path, filters=[("vec_id", "in", [0, 1, 2, 3, 4])])
    order = np.argsort(qtbl.column("vec_id").to_numpy())
    from web_search_engine_ray.pipelines.knn import _batch_matrix
    qmat = _batch_matrix(qtbl)[order]
    ds = ray.data.read_parquet(emb_path, columns=["vec_id", "embedding"])
    return knn_bruteforce(ds, [0, 1, 2, 3, 4], qmat, k=10)


def knn_ivf_q(sf_dir: str) -> pa.Table:
    """ANN over the persisted centroid-partitioned IVF index (memoized
    per sf_dir, manifest-checked): probe reads touch only the probed
    bucket directories, never the whole embeddings table."""
    from web_search_engine_ray.pipelines.knn import (_batch_matrix,
                                                     build_ivf_index,
                                                     knn_ivf_indexed)
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qtbl = pq.read_table(emb_path, filters=[("vec_id", "in", [0, 1, 2, 3, 4])])
    order = np.argsort(qtbl.column("vec_id").to_numpy())
    qmat = _batch_matrix(qtbl)[order]
    key = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    idx = f"/tmp/wse_ivf_{key}"
    ds = ray.data.read_parquet(emb_path, columns=["vec_id", "embedding"])
    build_ivf_index(ds, idx, n_centroids=16)
    return knn_ivf_indexed(idx, [0, 1, 2, 3, 4], qmat, k=10, nprobe=4)


def media_features(sf_dir: str) -> pa.Table:
    """Multimodal plumbing demo: documents' text bytes as opaque payloads
    through the actor-pool decode stage (FakeDecoder — see stages/media)."""
    from web_search_engine_ray.stages.media import MediaFeatureStage

    def to_media(batch: pa.Table) -> pa.Table:
        return pa.table({
            "media_id": batch.column("doc_id"),
            "kind": pa.array(["image"] * batch.num_rows, pa.string()),
            "payload": pa.array(
                [t.encode() for t in batch.column("text").to_pylist()],
                pa.large_binary()),
            "mime": pa.array(["application/octet-stream"] * batch.num_rows,
                             pa.string())})

    ds = _docs_ds(sf_dir, ["doc_id", "text"]) \
        .map_batches(to_media, batch_format="pyarrow") \
        .map_batches(MediaFeatureStage, batch_format="pyarrow",
                     batch_size=64, concurrency=(1, 4))
    return _collect(ds).drop_columns(["features"]) \
        .sort_by([("media_id", "ascending")])


def media_wav(sf_dir: str) -> pa.Table:
    """REAL audio decode end-to-end: wrap each doc's text bytes as a
    mono 16-bit PCM WAV payload, decode through the actor-pool stage
    with WavDecoder (pure-stdlib RIFF walk — no codec libs), verify
    frame counts in SQL via byte length."""
    import struct

    from web_search_engine_ray.stages.media import (MediaFeatureStage,
                                                    WavDecoder)

    def to_wav(batch: pa.Table) -> pa.Table:
        payloads = []
        for t in batch.column("text").to_pylist():
            data = t.encode()
            data = data[:len(data) // 2 * 2]        # whole 16-bit frames
            fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
            body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
                    + b"data" + struct.pack("<I", len(data)) + data)
            payloads.append(b"RIFF" + struct.pack("<I", 4 + len(body))
                            + b"WAVE" + body)
        n = batch.num_rows
        return pa.table({
            "media_id": batch.column("doc_id"),
            "kind": pa.array(["audio"] * n, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "mime": pa.array(["audio/wav"] * n, pa.string())})

    ds = _docs_ds(sf_dir, ["doc_id", "text"]) \
        .map_batches(to_wav, batch_format="pyarrow") \
        .map_batches(MediaFeatureStage, fn_constructor_args=(WavDecoder(),),
                     batch_format="pyarrow", batch_size=64,
                     concurrency=(1, 4))
    return _collect(ds).drop_columns(["features"]) \
        .sort_by([("media_id", "ascending")])


def events_by_type(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Count, Sum
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_type", "value"])
    agg = ds.groupby("event_type").aggregate(Count(), Sum("value"))
    tbl = _collect(agg)
    return pa.table({
        "event_type": tbl.column("event_type"),
        "n_events": tbl.column("count()"),
        "total_value": pa.array(
            np.round(tbl.column("sum(value)").to_numpy(zero_copy_only=False)
                     .astype(np.float64), 6)),
    }).sort_by([("event_type", "ascending")])


def ngram_jaccard(sf_dir: str) -> pa.Table:
    from web_search_engine_ray.pipelines.analysis import ngram_jaccard_pairs
    return ngram_jaccard_pairs(_docs_ds(sf_dir, ["doc_id", "text"]),
                               k=3, threshold=0.5)


def dedup_embedding(sf_dir: str) -> pa.Table:
    from web_search_engine_ray.pipelines.analysis import embedding_dup_pairs
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["vec_id", "embedding"])
    return embedding_dup_pairs(ds, threshold=0.45)


def winnow_fingerprint(sf_dir: str) -> pa.Table:
    from web_search_engine_ray.pipelines.analysis import winnow_batch
    ds = _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        winnow_batch, batch_format="pyarrow", zero_copy_batch=True)
    return _collect(ds).sort_by([("doc_id", "ascending"),
                                 ("fp_hash", "ascending")])


def token_stats(sf_dir: str) -> pa.Table:
    from web_search_engine_ray.pipelines.analysis import token_stats_batch
    ds = _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        token_stats_batch, batch_format="pyarrow", zero_copy_batch=True)
    return _collect(ds).sort_by([("doc_id", "ascending")])


def docs_sample(sf_dir: str) -> pa.Table:
    """O5: deterministic systematic sampling (doc_id stride) — the
    reproducible form of corpus sampling (random_sample() is
    seed-unstable across cluster layouts, so the engine pins stride
    sampling for anything correctness-adjacent)."""
    import pyarrow.compute as pc

    def pick(batch: pa.Table) -> pa.Table:
        keep = pc.equal(pc.bit_wise_and(batch.column("doc_id"), 15), 0)
        return batch.filter(keep)

    ds = _docs_ds(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        pick, batch_format="pyarrow", zero_copy_batch=True)
    return _collect(ds).sort_by([("doc_id", "ascending")])


def quality_topk_per_lang(sf_dir: str) -> pa.Table:
    """Group-wise top-k (window-function analog): 3 longest docs per
    language — exercises pipelines/window.py:group_topk."""
    from web_search_engine_ray.pipelines.analysis import doc_tokens_batch
    from web_search_engine_ray.pipelines.window import group_topk

    def with_lang(batch: pa.Table) -> pa.Table:
        toks = doc_tokens_batch(batch)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "lang": batch.column("lang"),
                         "n_tokens": toks.column("n_tokens")})

    ds = _docs_ds(sf_dir, ["doc_id", "lang", "text"]).map_batches(
        with_lang, batch_format="pyarrow", zero_copy_batch=True)
    return group_topk(ds, key="lang", order_col="n_tokens", k=3,
                      id_col="doc_id")


def docs_rank(sf_dir: str) -> pa.Table:
    """Per-lang ROW_NUMBER / RANK / DENSE_RANK of docs by token count
    (DESC, doc_id tie-break) — exercises analytic.rank_in_key; the
    integer n_tokens column ties often, so rank vs dense_rank vs
    row_number genuinely diverge."""
    from web_search_engine_ray.pipelines.analysis import doc_tokens_batch
    from web_search_engine_ray.pipelines.analytic import rank_in_key

    def with_lang(batch: pa.Table) -> pa.Table:
        toks = doc_tokens_batch(batch)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "lang": batch.column("lang"),
                         "n_tokens": toks.column("n_tokens")})

    ds = _docs_ds(sf_dir, ["doc_id", "lang", "text"]).map_batches(
        with_lang, batch_format="pyarrow", zero_copy_batch=True)
    out = rank_in_key(ds, key="lang", order_col="n_tokens",
                      id_col="doc_id", descending=True)
    return _collect(out).sort_by([("doc_id", "ascending")])


def events_hourly(sf_dir: str) -> pa.Table:
    """Tumbling-window aggregate: per (event_type, hour) count + sum —
    exercises pipelines/window.py:tumbling_window_agg."""
    from web_search_engine_ray.pipelines.window import tumbling_window_agg
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_type", "ts", "value"])
    return tumbling_window_agg(ds, key="event_type", ts_col="ts",
                               value_col="value",
                               width_us=3_600_000_000)


def events_sessionize(sf_dir: str) -> pa.Table:
    from web_search_engine_ray.pipelines.sessionize import sessionize
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id", "ts"])
    return sessionize(ds)


def events_json(sf_dir: str) -> pa.Table:
    """F6: JSON scalar extraction inside map_batches (props -> k)."""
    import json as _json

    from ray.data.aggregate import Count, Sum

    def parse(batch: pa.Table) -> pa.Table:
        ks = [int(_json.loads(p)["k"]) for p in
              batch.column("props").to_pylist()]
        return pa.table({"event_type": batch.column("event_type"),
                         "k": pa.array(ks, pa.int64())})

    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_type", "props"]) \
        .map_batches(parse, batch_format="pyarrow", zero_copy_batch=True)
    tbl = _collect(ds.groupby("event_type").aggregate(Count(), Sum("k")))
    return pa.table({"event_type": tbl.column("event_type"),
                     "n_events": tbl.column("count()"),
                     "sum_k": tbl.column("sum(k)")}) \
        .sort_by([("event_type", "ascending")])


_TRANSCRIPTS_N_CONVS = 1000
_TRANSCRIPTS_CORPUS = f"/tmp/wse_oracle_transcripts_{_TRANSCRIPTS_N_CONVS}.parquet"


def _ensure_transcripts_corpus() -> str:
    """Persist the deterministic synthetic transcript corpus so the
    DuckDB oracle can read_parquet the EXACT same input the engine
    indexes (generator is partition-independent — T-DET)."""
    if not os.path.exists(_TRANSCRIPTS_CORPUS):
        from web_search_engine_ray.sources.transcripts import \
            gen_transcripts_table
        tmp = _TRANSCRIPTS_CORPUS + ".tmp"
        pq.write_table(gen_transcripts_table(_TRANSCRIPTS_N_CONVS), tmp)
        os.replace(tmp, _TRANSCRIPTS_CORPUS)
    return _TRANSCRIPTS_CORPUS


def transcripts_bm25(sf_dir: str) -> pa.Table:
    """Flagship over SYNTHETIC transcripts (full E1: docID assignment,
    salting, merge; E2: WAND + J2 metadata attach).  Corpus size is
    PINNED (not sf-scaled) so the static oracle SQL reads the same
    parquet at any sf_dir; sf scaling of this path lives in bench.py."""
    from web_search_engine_ray.sources.transcripts import (gen_queries,
                                                           gen_transcripts)
    _ensure_transcripts_corpus()
    out = f"/tmp/wse_idx_transcripts_{_TRANSCRIPTS_N_CONVS}"
    build_index(gen_transcripts(_TRANSCRIPTS_N_CONVS), out, resume=True)
    res = run_queries(out, gen_queries(), k=10, mode="wand",
                      attach_doc_meta=True)
    return res.set_column(res.schema.get_field_index("score"), "score",
                          pa.array(np.round(res.column("score").to_numpy(), 6)))


def _collect(ds: "ray.data.Dataset") -> pa.Table:
    batches = list(ds.iter_batches(batch_format="pyarrow"))
    if batches:
        return pa.concat_tables(batches)
    # empty result: keep the column schema (a column-less table breaks
    # downstream sort_by and the driver's column-name comparison)
    try:
        sch = ds.schema()
        return pa.schema(list(zip(sch.names, sch.types))).empty_table()
    except Exception:
        return pa.table({})


# --- curation ops (pipelines/curation.py) --------------------------------

# The driver testdata has no separate benchmark table; one source stripe
# of `documents` plays the eval set (benchmark = small side, as in a
# real decontamination run where eval suites are ~10^3..10^6 docs).
DECONTAM_BENCH_SOURCE = "src0"

# Pinned phrase set: frequent bigrams, two selective trigrams, one
# absent phrase (exercises the empty-candidate path).
PHRASES: list[tuple[int, str]] = [
    (0, "hash join"), (1, "slow query"), (2, "merge sort"),
    (3, "key value"), (4, "window agg stream"), (5, "data table scan"),
    (6, "unseenterm spark"),
]


def decontam(sf_dir: str) -> pa.Table:
    from web_search_engine_ray.pipelines import curation
    ds = _docs_ds(sf_dir, ["doc_id", "text", "source"])
    bench = ds.filter(expr=f"source == '{DECONTAM_BENCH_SOURCE}'")
    corpus = ds.filter(expr=f"source != '{DECONTAM_BENCH_SOURCE}'")
    return curation.decontaminate(corpus, bench, k=curation.DECONTAM_K)


def split_docs(sf_dir: str) -> pa.Table:
    from web_search_engine_ray.pipelines.curation import train_val_split
    ds = train_val_split(_docs_ds(sf_dir, ["doc_id"]), val_frac=0.1)
    return _collect(ds).sort_by([("doc_id", "ascending")])


def repetition(sf_dir: str) -> pa.Table:
    from web_search_engine_ray.pipelines.curation import repetition_stats
    ds = repetition_stats(_docs_ds(sf_dir, ["doc_id", "text"]))
    return _collect(ds).sort_by([("doc_id", "ascending")])


def phrase_match(sf_dir: str) -> pa.Table:
    from web_search_engine_ray.pipelines.curation import phrase_search
    idx = index_for(sf_dir)
    return phrase_search(idx, _docs_ds(sf_dir, ["doc_id", "text"]), PHRASES)


def pos_index_for(sf_dir: str) -> str:
    """Build (or reuse) the positional sidecar index over documents."""
    from web_search_engine_ray.pipelines.positional import \
        build_positional_index
    key = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    out = f"/tmp/wse_pos_{key}"
    done = os.path.join(out, "_DONE")
    if not os.path.exists(done):
        build_positional_index(_documents_path(sf_dir), out)
        with open(done, "w") as f:
            f.write("ok")
    return out


def phrase_match_pos(sf_dir: str) -> pa.Table:
    """Index-native phrase adjacency (no corpus text touched at query
    time) — same oracle as phrase_match by construction."""
    from web_search_engine_ray.pipelines.positional import phrase_search_pos
    return phrase_search_pos(pos_index_for(sf_dir), PHRASES)


def top_bigrams_q(sf_dir: str) -> pa.Table:
    from web_search_engine_ray.pipelines.ngrams import top_bigrams
    return top_bigrams(_docs_ds(sf_dir, ["doc_id", "text"]), k=25)


def pmi_bigrams_q(sf_dir: str) -> pa.Table:
    from web_search_engine_ray.pipelines.ngrams import pmi_bigrams
    return pmi_bigrams(_docs_ds(sf_dir, ["doc_id", "text"]),
                       min_count=5, k=25)


def _tpch(sf_dir: str, name: str, columns=None) -> "ray.data.Dataset":
    return ray.data.read_parquet(os.path.join(sf_dir, f"{name}.parquet"),
                                 columns=columns)


def tpch_pricing(sf_dir: str) -> pa.Table:
    from web_search_engine_ray.pipelines.relational import pricing_summary
    return pricing_summary(
        _tpch(sf_dir, "lineitem",
              ["l_returnflag", "l_linestatus", "l_quantity",
               "l_extendedprice", "l_discount", "l_tax", "l_shipdate"]),
        "1998-09-01")


def tpch_shipping(sf_dir: str) -> pa.Table:
    from web_search_engine_ray.pipelines.relational import (
        shipping_priority_topk)
    return shipping_priority_topk(
        _tpch(sf_dir, "customer", ["c_custkey", "c_mktsegment"]),
        _tpch(sf_dir, "orders",
              ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]),
        _tpch(sf_dir, "lineitem",
              ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]),
        segment="BUILDING", date="1998-03-15", k=10)


def tpch_nation_revenue(sf_dir: str) -> pa.Table:
    from web_search_engine_ray.pipelines.relational import nation_revenue
    return nation_revenue(
        pq.read_table(os.path.join(sf_dir, "region.parquet")),
        pq.read_table(os.path.join(sf_dir, "nation.parquet")),
        _tpch(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        _tpch(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
        _tpch(sf_dir, "lineitem",
              ["l_orderkey", "l_extendedprice", "l_discount"]),
        region_name="ASIA", date_lo="1996-01-01", date_hi="1998-01-01")


def events_asof(sf_dir: str) -> pa.Table:
    """As-of join: each click event gains the latest prior view value
    of the same user (inner; clicks with no prior view drop)."""
    from web_search_engine_ray.pipelines.temporal import asof_join
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type", "value"])
    clicks = ev.filter(expr="event_type == 'click'") \
        .select_columns(["event_id", "ts", "user_id", "value"])
    views = ev.filter(expr="event_type == 'view'") \
        .select_columns(["ts", "user_id", "value"])
    out = asof_join(clicks, views, key="user_id", ts_col="ts",
                    value_cols=["value"])
    t = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")),
                         promote_options="default")
    return t.sort_by([("event_id", "ascending")])


HOP_WINDOW_US = 3_600_000_000   # 1 h windows ...
HOP_SLIDE_US = 900_000_000      # ... every 15 min (4x overlap)


def events_hopping(sf_dir: str) -> pa.Table:
    from web_search_engine_ray.pipelines.temporal import hopping_window_agg
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["ts", "event_type", "value"])
    out = hopping_window_agg(ev, "ts", "event_type", "value",
                             HOP_WINDOW_US, HOP_SLIDE_US)
    t = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")),
                         promote_options="default")
    return t.sort_by([("window_start", "ascending"),
                      ("event_type", "ascending")])


VALUE_BANDS = [(0.0, 10.0, "low"), (5.0, 50.0, "mid"),
               (50.0, 200.0, "high"), (200.0, 1000.0, "extreme")]
DOC_SOURCES = [f"src{i}" for i in range(20)]


def events_banded(sf_dir: str) -> pa.Table:
    """Non-equi band join: events matched into overlapping value bands
    (a row can land in several; unmatched rows drop)."""
    from web_search_engine_ray.pipelines.relational import range_join
    bands = pa.table({
        "lo": pa.array([b[0] for b in VALUE_BANDS], pa.float64()),
        "hi": pa.array([b[1] for b in VALUE_BANDS], pa.float64()),
        "label": pa.array([b[2] for b in VALUE_BANDS], pa.string())})
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_id", "value"])
    out = range_join(ev, "value", bands, "lo", "hi", ["label"])
    return pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")),
                            promote_options="default") \
        .sort_by([("event_id", "ascending"), ("label", "ascending")])


def docs_pivot(sf_dir: str) -> pa.Table:
    from web_search_engine_ray.pipelines.relational import pivot_counts
    return pivot_counts(_docs_ds(sf_dir, ["lang", "source"]),
                        "lang", "source", DOC_SOURCES)


def docs_stratified(sf_dir: str) -> pa.Table:
    from web_search_engine_ray.pipelines.sampling import stratified_sample
    return stratified_sample(_docs_ds(sf_dir, ["doc_id", "lang", "source"]),
                             key="lang", id_col="doc_id", n_per_group=5)


def orders_unfulfilled(sf_dir: str) -> pa.Table:
    """Anti join: orders with no lineitem rows at all."""
    from web_search_engine_ray.functions.grouping import anti_join
    orders = _tpch(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    line = _tpch(sf_dir, "lineitem", ["l_orderkey"]) \
        .map_batches(lambda b: b.rename_columns(["o_orderkey"]),
                     batch_format="pyarrow", zero_copy_batch=True)
    out = anti_join(orders, line, on="o_orderkey")
    return pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")),
                            promote_options="default") \
        .sort_by([("o_orderkey", "ascending")])


def emb_centroids(sf_dir: str) -> pa.Table:
    from web_search_engine_ray.pipelines.vectors import label_centroids
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["label", "embedding"])
    return label_centroids(ds, "label", "embedding")


def customer_orders_left(sf_dir: str) -> pa.Table:
    """LEFT OUTER hash join: every customer (custkey <= 100) with each
    of their orders; orderless customers keep a null o_orderkey."""
    from web_search_engine_ray.functions.grouping import hash_join
    cust = _tpch(sf_dir, "customer", ["c_custkey", "c_mktsegment"]) \
        .filter(expr="c_custkey <= 100")
    orders = _tpch(sf_dir, "orders", ["o_custkey", "o_orderkey"]) \
        .map_batches(lambda b: b.rename_columns(["c_custkey", "o_orderkey"]),
                     batch_format="pyarrow", zero_copy_batch=True)
    out = hash_join(cust, orders, on="c_custkey", how="left")
    return pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")),
                            promote_options="default") \
        .sort_by([("c_custkey", "ascending"), ("o_orderkey", "ascending")])


def events_cumsum(sf_dir: str) -> pa.Table:
    """Per-user running value sum ordered by (ts, event_id) — the
    analytic-window operator (pipelines/analytic.py)."""
    from web_search_engine_ray.pipelines.analytic import running_sum
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_id", "ts", "user_id",
                                        "value"])
    out = running_sum(ev, key="user_id", ts_col="ts", val_col="value",
                      id_col="event_id")
    return pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")),
                            promote_options="default") \
        .sort_by([("event_id", "ascending")])


def curated_corpus(sf_dir: str) -> pa.Table:
    """Flagship end-to-end curation: dedup -> decontaminate -> quality
    gate -> split, composed from the curation operators."""
    from web_search_engine_ray.pipelines.curation import curate_corpus
    return curate_corpus(
        _docs_ds(sf_dir, ["doc_id", "lang", "source", "text"]),
        bench_source=DECONTAM_BENCH_SOURCE, k=DECONTAM_K, q=0.5,
        val_frac=0.1)


def events_rolling(sf_dir: str) -> pa.Table:
    """Per-user 4-row moving average of value, ordered by (ts, id)."""
    from web_search_engine_ray.pipelines.analytic import rolling_mean
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_id", "ts", "user_id",
                                        "value"])
    out = rolling_mean(ev, key="user_id", ts_col="ts", val_col="value",
                       id_col="event_id", window_rows=4)
    return pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")),
                            promote_options="default") \
        .sort_by([("event_id", "ascending")])


def docs_rollup(sf_dir: str) -> pa.Table:
    """GROUP BY ROLLUP(lang, source) counts with DuckDB null-filling."""
    from web_search_engine_ray.pipelines.relational import rollup_counts
    return rollup_counts(_docs_ds(sf_dir, ["lang", "source"]),
                         ["lang", "source"])


def quality_gate(sf_dir: str) -> pa.Table:
    """Percentile quality filter: docs at/above their lang's median
    token count."""
    from web_search_engine_ray.pipelines.curation import quality_gate as qg
    return qg(_docs_ds(sf_dir, ["doc_id", "lang", "text"]), q=0.5)


def events_lag(sf_dir: str) -> pa.Table:
    """Per-user LAG(ts): each event gains the previous event's ts (by
    (ts, event_id) order); first event per user is null."""
    from web_search_engine_ray.pipelines.analytic import shift_by_key
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_id", "ts", "user_id"])
    out = shift_by_key(ev, key="user_id", ts_col="ts", shift_col="ts",
                       id_col="event_id", offset=1, out_col="lag_ts")
    return pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")),
                            promote_options="default") \
        .sort_by([("event_id", "ascending")])


GROUPED_QS = [0.25, 0.5, 0.9]


def events_quantiles_by_type(sf_dir: str) -> pa.Table:
    from web_search_engine_ray.pipelines.quantiles import grouped_quantiles
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_type", "value"])
    return grouped_quantiles(ds, "event_type", "value", GROUPED_QS)


def events_distinct_users(sf_dir: str) -> pa.Table:
    from web_search_engine_ray.pipelines.distinct import count_distinct
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_type", "user_id"])
    return count_distinct(ds, "event_type", "user_id")


def events_distinct_pairs(sf_dir: str) -> pa.Table:
    from web_search_engine_ray.pipelines.distinct import distinct_rows
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_type", "user_id"])
    out = distinct_rows(ds, ["event_type", "user_id"])
    return pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")),
                            promote_options="default") \
        .sort_by([("event_type", "ascending"), ("user_id", "ascending")])


def events_hll(sf_dir: str) -> pa.Table:
    """Approximate distinct users (HLL sketch, p=14).  No SQL oracle —
    the sketch is not SQL-expressible; its error bound is pinned by
    tests/test_distinct.py against the exact count."""
    from web_search_engine_ray.pipelines.distinct import approx_distinct
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id"])
    est = approx_distinct(ds, "user_id", p=14)
    return pa.table({"metric": pa.array(["approx_distinct_users"]),
                     "estimate": pa.array([est], pa.int64())})


QUANTILE_QS = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def events_quantiles(sf_dir: str) -> pa.Table:
    from web_search_engine_ray.pipelines.quantiles import exact_quantiles
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["value"])
    return exact_quantiles(ds, "value", QUANTILE_QS)


def tfidf_keywords_q(sf_dir: str) -> pa.Table:
    from web_search_engine_ray.pipelines.ngrams import tfidf_keywords
    n = _docs_ds(sf_dir, ["doc_id"]).count()
    return tfidf_keywords(_docs_ds(sf_dir, ["doc_id", "text"]),
                          n_docs=n, k=3)


# --- DuckDB oracle SQL ---------------------------------------------------

_TOKS = ("SELECT doc_id, unnest(regexp_extract_all(lower(text), "
         "'[a-z0-9]+')) AS term FROM documents")

# tokens with per-doc positions (for n-gram oracles)
_TOKS_POS = (
    "SELECT doc_id, source, "
    "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term, "
    "generate_subscripts(regexp_extract_all(lower(text), '[a-z0-9]+'), 1) "
    "AS pos FROM documents")


def _gram_expr(k: int) -> str:
    parts = ["term"] + [
        f"lead(term,{i}) OVER (PARTITION BY doc_id ORDER BY pos)"
        for i in range(1, k)]
    return " || ' ' || ".join(parts)


def _phrase_sql() -> str:
    from web_search_engine_ray.pipelines.curation import phrase_regex
    parts = [
        f"SELECT CAST({pid} AS BIGINT) AS phrase_id, doc_id FROM documents "
        f"WHERE regexp_matches(lower(text), '{phrase_regex(ph)}')"
        for pid, ph in PHRASES]
    return ("SELECT phrase_id, doc_id FROM (" + " UNION ALL ".join(parts)
            + ") ORDER BY phrase_id, doc_id")


def _decontam_sql(k: int) -> str:
    """Exact-string recomputation of curation.decontaminate: distinct
    k-grams per doc; corpus docs (source != bench stripe) sharing >= 1
    gram with the benchmark stripe, counting the doc's DISTINCT shared
    grams.  The engine compares md5-64bit gram hashes; at sf scales the
    collision odds (~n^2/2^65) are below one expected pair, so the
    string join is the exact oracle."""
    return f"""
WITH toks AS ({_TOKS_POS}),
g AS (SELECT doc_id, source, {_gram_expr(k)} AS gram FROM toks),
gg AS (SELECT DISTINCT doc_id, source, gram FROM g WHERE gram IS NOT NULL),
bench AS (SELECT DISTINCT gram FROM gg WHERE source = '{DECONTAM_BENCH_SOURCE}'),
corp AS (SELECT doc_id, gram FROM gg WHERE source <> '{DECONTAM_BENCH_SOURCE}')
SELECT c.doc_id, count(*)::BIGINT AS n_shared_grams
FROM corp c JOIN bench b USING (gram)
GROUP BY c.doc_id ORDER BY c.doc_id"""


def _curated_sql(k: int, val_frac: float) -> str:
    """Exact recomputation of curation.curate_corpus: exact dedup (min
    doc_id per text, bench stripe excluded) -> drop benchmark-k-gram-
    contaminated docs -> per-lang quantile_disc(0.5) token gate with
    thresholds over the SURVIVORS of 1-2 -> md5 split labels."""
    from web_search_engine_ray.pipelines.curation import split_threshold_hex
    thr = split_threshold_hex(val_frac)
    return f"""
WITH toks AS ({_TOKS_POS}),
g AS (SELECT doc_id, source, {_gram_expr(k)} AS gram FROM toks),
gg AS (SELECT DISTINCT doc_id, source, gram FROM g WHERE gram IS NOT NULL),
bench AS (SELECT DISTINCT gram FROM gg
          WHERE source = '{DECONTAM_BENCH_SOURCE}'),
contaminated AS (SELECT DISTINCT c.doc_id
                 FROM (SELECT doc_id, gram FROM gg
                       WHERE source <> '{DECONTAM_BENCH_SOURCE}') c
                 JOIN bench b USING (gram)),
dd AS (SELECT min(doc_id) AS doc_id FROM documents
       WHERE source <> '{DECONTAM_BENCH_SOURCE}' GROUP BY text),
surv AS (SELECT d.doc_id, d.lang,
                len(regexp_extract_all(lower(d.text),
                    '[a-z0-9]+'))::BIGINT AS n_tokens
         FROM documents d JOIN dd USING (doc_id)
         WHERE d.doc_id NOT IN (SELECT doc_id FROM contaminated)),
m AS (SELECT lang, quantile_disc(n_tokens, 0.5) AS med
      FROM surv GROUP BY lang)
SELECT s.doc_id, s.lang, s.n_tokens,
       CASE WHEN substr(md5(CAST(s.doc_id AS VARCHAR)), 1, 4) < '{thr}'
            THEN 'val' ELSE 'train' END AS split
FROM surv s JOIN m USING (lang) WHERE s.n_tokens >= m.med
ORDER BY s.doc_id"""


def _split_sql(val_frac: float) -> str:
    from web_search_engine_ray.pipelines.curation import split_threshold_hex
    thr = split_threshold_hex(val_frac)
    return f"""
SELECT doc_id,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{thr}'
            THEN 'val' ELSE 'train' END AS split
FROM documents ORDER BY doc_id"""


_REPETITION_SQL = f"""
WITH toks AS ({_TOKS_POS}),
tf AS (SELECT doc_id, term, count(*)::BIGINT c FROM toks GROUP BY 1, 2),
ta AS (SELECT doc_id, sum(c)::BIGINT n,
              sum(CASE WHEN c > 1 THEN c ELSE 0 END)::BIGINT dup
       FROM tf GROUP BY 1),
bg AS (SELECT doc_id,
              term || ' ' || lead(term) OVER (PARTITION BY doc_id
                                              ORDER BY pos) AS g
       FROM toks),
bf AS (SELECT doc_id, g, count(*)::BIGINT c FROM bg WHERE g IS NOT NULL
       GROUP BY 1, 2),
ba AS (SELECT doc_id, sum(c)::BIGINT tot, max(c)::BIGINT mx,
              sum(CASE WHEN c > 1 THEN c ELSE 0 END)::BIGINT dup2
       FROM bf GROUP BY 1)
SELECT d.doc_id, coalesce(ta.n, 0)::BIGINT AS n_tokens,
       round(CASE WHEN coalesce(ta.n, 0) = 0 THEN 0.0
             ELSE ta.dup::DOUBLE / ta.n END, 6) AS dup_token_frac,
       round(CASE WHEN ba.tot IS NULL THEN 0.0
             ELSE ba.mx::DOUBLE / ba.tot END, 6) AS top_2gram_frac,
       round(CASE WHEN ba.tot IS NULL THEN 0.0
             ELSE ba.dup2::DOUBLE / ba.tot END, 6) AS dup_2gram_frac
FROM documents d LEFT JOIN ta USING (doc_id) LEFT JOIN ba USING (doc_id)
ORDER BY doc_id"""


_BIGRAM_BASE = f"""
toks AS ({_TOKS_POS}),
bg AS (SELECT term || ' ' || lead(term) OVER (PARTITION BY doc_id
                                              ORDER BY pos) AS g
       FROM toks),
bc AS (SELECT g, count(*)::BIGINT c FROM bg WHERE g IS NOT NULL GROUP BY g)"""

_TOP_BIGRAMS_SQL = f"""
WITH {_BIGRAM_BASE}
SELECT g AS bigram, c AS n_occ FROM bc
ORDER BY n_occ DESC, bigram LIMIT 25"""

# mirrors ngrams.pmi_bigrams exactly: same division order inside ln,
# rounded to 6 before the (pmi desc, bigram asc) top-k
_PMI_SQL = f"""
WITH {_BIGRAM_BASE},
uc AS (SELECT term, count(*)::BIGINT c FROM toks GROUP BY term),
tot AS (SELECT (SELECT sum(c) FROM bc)::DOUBLE t2,
               (SELECT sum(c) FROM uc)::DOUBLE t1)
SELECT b.g AS bigram, b.c AS n_occ,
       round(ln((b.c / t.t2) / ((ua.c / t.t1) * (ub.c / t.t1))), 6) AS pmi
FROM bc b
JOIN uc ua ON ua.term = split_part(b.g, ' ', 1)
JOIN uc ub ON ub.term = split_part(b.g, ' ', 2)
CROSS JOIN tot t
WHERE b.c >= 5
ORDER BY pmi DESC, bigram LIMIT 25"""

_TFIDF_SQL = f"""
WITH toks AS ({_TOKS}),
tf AS (SELECT doc_id, term, count(*)::BIGINT tf FROM toks GROUP BY 1, 2),
df AS (SELECT term, count(DISTINCT doc_id)::BIGINT df FROM toks
       GROUP BY term),
n AS (SELECT count(*)::DOUBLE n FROM documents),
s AS (SELECT t.doc_id, t.term, round(t.tf * ln(n.n / f.df), 6) AS score
      FROM tf t JOIN df f USING (term) CROSS JOIN n),
r AS (SELECT doc_id, term, score,
      CAST(row_number() OVER (PARTITION BY doc_id
                              ORDER BY score DESC, term) AS INTEGER) AS rank
      FROM s)
SELECT doc_id, term, score, rank FROM r WHERE rank <= 3
ORDER BY doc_id, rank"""


def _query_terms_values(queries: list[tuple[int, str]]) -> str:
    values = []
    for qid, q in queries:
        for t in sorted(set(tokenize(q))):
            values.append(f"({qid}, '{t}')")
    return ", ".join(values)


def _bm25_sql() -> str:
    vals = _query_terms_values(BM25_QUERIES)
    return f"""
WITH toks AS ({_TOKS}),
tf AS (SELECT doc_id, term, count(*)::BIGINT tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT dl FROM toks GROUP BY 1),
stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE n,
                 sum(dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl
          FROM dl),
df AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
qt(query_id, term) AS (VALUES {vals}),
scored AS (
  SELECT q.query_id::BIGINT AS query_id, t.doc_id,
         sum(ln(1 + (s.n - f.df + 0.5) / (f.df + 0.5))
             * t.tf / (t.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / s.avgdl))) AS s
  FROM qt q
  JOIN tf t ON t.term = q.term
  JOIN dl d ON d.doc_id = t.doc_id
  JOIN df f ON f.term = t.term
  CROSS JOIN stats s
  GROUP BY q.query_id, t.doc_id)
SELECT query_id,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY s DESC, doc_id) AS INTEGER) AS rank,
       doc_id, round(s, 6) AS score
FROM scored
QUALIFY rank <= {BM25_K}
ORDER BY query_id, rank
"""


def _transcripts_bm25_sql() -> str:
    """Same BM25 CTE family as _bm25_sql, over the persisted synthetic
    transcript corpus: doc_id = row_number() over (conv_id, turn_idx) - 1
    reproduces the engine's dense conv-prefix-sum docID assignment
    (turn_idx is dense 0..n-1 per conversation)."""
    from web_search_engine_ray.sources.transcripts import gen_queries
    qtbl = gen_queries()
    qs = list(zip(qtbl.column("query_id").to_pylist(),
                  qtbl.column("query").to_pylist()))
    vals = _query_terms_values(qs)
    path = _ensure_transcripts_corpus()
    return f"""
WITH docs AS (SELECT conv_id, turn_idx, text,
              row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS doc_id
              FROM read_parquet('{path}')),
toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
         AS term FROM docs),
tf AS (SELECT doc_id, term, count(*)::BIGINT tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT dl FROM toks GROUP BY 1),
stats AS (SELECT (SELECT count(*) FROM docs)::DOUBLE n,
                 sum(dl)::DOUBLE / (SELECT count(*) FROM docs) AS avgdl
          FROM dl),
df AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
qt(query_id, term) AS (VALUES {vals}),
scored AS (
  SELECT q.query_id::BIGINT AS query_id, t.doc_id,
         sum(ln(1 + (s.n - f.df + 0.5) / (f.df + 0.5))
             * t.tf / (t.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / s.avgdl))) AS s
  FROM qt q
  JOIN tf t ON t.term = q.term
  JOIN dl d ON d.doc_id = t.doc_id
  JOIN df f ON f.term = t.term
  CROSS JOIN stats s
  GROUP BY q.query_id, t.doc_id),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY s DESC, doc_id) AS INTEGER) AS rank,
         doc_id, round(s, 6) AS score
  FROM scored QUALIFY rank <= {BM25_K})
SELECT r.query_id, r.rank, r.doc_id, r.score, d.conv_id, d.turn_idx
FROM ranked r JOIN docs d USING (doc_id)
ORDER BY r.query_id, r.rank
"""


def _jaccard_sql(threshold: float) -> str:
    """All doc pairs with exact word-3-shingle Jaccard >= threshold —
    the oracle for both ngram_jaccard (0.5) and dedup_minhash (0.8)."""
    return f"""
WITH d AS (SELECT doc_id, regexp_extract_all(lower(text),'[a-z0-9]+') toks
           FROM documents),
sh AS (SELECT doc_id, concat_ws(' ', toks[i.i], toks[i.i+1], toks[i.i+2]) AS shingle
       FROM d CROSS JOIN LATERAL (SELECT unnest(range(1, len(toks)-1)) AS i) i
       WHERE len(toks) >= 3),
s AS (SELECT DISTINCT doc_id, shingle FROM sh),
cnt AS (SELECT doc_id, count(*) c FROM s GROUP BY doc_id),
inter AS (SELECT x.doc_id a, y.doc_id b, count(*) i
          FROM s x JOIN s y USING (shingle)
          WHERE x.doc_id < y.doc_id GROUP BY 1, 2)
SELECT a AS doc_id_a, b AS doc_id_b,
       round(i::DOUBLE / (ca.c + cb.c - i), 6) AS jaccard
FROM inter JOIN cnt ca ON ca.doc_id = a JOIN cnt cb ON cb.doc_id = b
WHERE i::DOUBLE / (ca.c + cb.c - i) >= {threshold}
ORDER BY 1, 2"""


def _lang_id_sql() -> str:
    """Reproduces textproc.lang_id exactly: per-language stopword-hit
    counts, winner = max hits with alphabetical tie-break, 'und' on zero
    hits, confidence = hits / n_tokens."""
    from web_search_engine_ray.functions.textproc import LANG_PROFILES
    langs = sorted(LANG_PROFILES)
    cols = ", ".join(
        "len(list_filter(toks, x -> x IN ('"
        + "','".join(sorted(LANG_PROFILES[lang])) + f"'))) AS h_{lang}"
        for lang in langs)
    case = " ".join(f"WHEN '{lang}' THEN h_{lang}" for lang in langs)
    vals = ", ".join(f"('{lang}')" for lang in langs)
    return f"""
WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
h AS (SELECT doc_id, len(toks) AS n, {cols} FROM d),
u AS (SELECT doc_id, n, v.lang, CASE v.lang {case} END AS hits
      FROM h CROSS JOIN (VALUES {vals}) v(lang)),
best AS (SELECT doc_id, n, lang, hits,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY hits DESC, lang) AS rn
         FROM u)
SELECT doc_id,
       CASE WHEN hits = 0 THEN 'und' ELSE lang END AS pred_lang,
       round(CASE WHEN n = 0 THEN 0.0 ELSE hits::DOUBLE / n END, 6)
         AS confidence
FROM best WHERE rn = 1 ORDER BY doc_id"""


def _simhash_sql(max_hamming: int = 3) -> str:
    """Recomputes the engine's 64-bit tf-weighted SimHash in SQL: token
    hash = first 16 hex chars of md5 (== textproc.term_hash64), bit i of
    the hash read from its hex nibble, sign-sum per (doc, bit), then
    all-pairs hamming over the 64 per-doc sign bits.  Exact because the
    engine's 4×16-bit banding has full recall at hamming <= 3."""
    nib = "strpos('0123456789abcdef', substr(h.hx, CAST(16 - i.i // 4 AS INT), 1)) - 1"
    div = "CASE i.i % 4 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 8 END"
    return f"""
WITH toks AS ({{toks}}),
tf AS (SELECT doc_id, term, count(*)::BIGINT tf FROM toks GROUP BY 1, 2),
th AS (SELECT DISTINCT term, md5(term) AS hx FROM tf),
bits AS (
  SELECT t.doc_id, i.i AS bit,
         sum(CASE WHEN (({nib}) // ({div})) % 2 = 1
                  THEN t.tf ELSE -t.tf END) AS s
  FROM tf t JOIN th h USING (term)
  CROSS JOIN (SELECT unnest(range(64)) AS i) i
  GROUP BY 1, 2),
sb AS (SELECT doc_id, bit, CAST(s > 0 AS INT) AS b FROM bits),
ham AS (SELECT x.doc_id a, y.doc_id b,
               sum(CASE WHEN x.b <> y.b THEN 1 ELSE 0 END) AS hd
        FROM sb x JOIN sb y ON x.bit = y.bit AND x.doc_id < y.doc_id
        GROUP BY 1, 2)
SELECT a AS doc_id_a, b AS doc_id_b, CAST(hd AS INTEGER) AS hamming
FROM ham WHERE hd <= {max_hamming} ORDER BY 1, 2""".replace("{toks}", _TOKS)


_HEXVAL = "strpos('0123456789abcdef', substr(h,{p},1)) - 1"

_MEDIA_SQL = f"""
WITH hx AS (SELECT doc_id AS media_id, sha256(text) AS h FROM documents)
SELECT media_id, 'image' AS kind,
       CAST(16 + ({_HEXVAL.format(p=1)}) * 16 + ({_HEXVAL.format(p=2)})
            AS INTEGER) AS width,
       CAST(16 + ({_HEXVAL.format(p=3)}) * 16 + ({_HEXVAL.format(p=4)})
            AS INTEGER) AS height,
       CAST(1 AS INTEGER) AS n_frames
FROM hx ORDER BY media_id"""


# --- round-5 analytic / set-op / funnel additions -------------------------

def events_ntile(sf_dir: str) -> pa.Table:
    """NTILE(4) per user ordered by (ts, event_id) — exercises
    analytic.ntile_in_key (SQL tile-size rule, vectorized)."""
    from web_search_engine_ray.pipelines.analytic import ntile_in_key
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_id", "user_id", "ts"])
    out = ntile_in_key(ds, key="user_id", ts_col="ts", id_col="event_id",
                       n_tiles=4)
    return _collect(out).sort_by([("event_id", "ascending")])


def events_lead(sf_dir: str) -> pa.Table:
    """LEAD(ts) per user ordered by (ts, event_id) — the negative-offset
    form of analytic.shift_by_key (events_lag covers LAG).  Shifts the
    timestamp column (like events_lag) so the null at each key's last
    row is a typed NaT, not a float NaN."""
    from web_search_engine_ray.pipelines.analytic import shift_by_key
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts"])
    out = shift_by_key(ds, key="user_id", ts_col="ts", shift_col="ts",
                       id_col="event_id", offset=-1)
    return _collect(out).sort_by([("event_id", "ascending")])


# Funnel step predicates: view -> high-value click -> high-value purchase
# (the raw view->click->purchase funnel converts every synthetic user, so
# value gates keep the step counts discriminating).
FUNNEL_STEPS = [("view", 0.0), ("click", 150.0), ("purchase", 250.0)]


def events_funnel(sf_dir: str) -> pa.Table:
    """Ordered-pattern conversion counts (funnel.funnel_counts): users
    who did a view, then a click with value > 150 strictly later, then
    a purchase with value > 250 strictly later."""
    import pyarrow.compute as pc

    from web_search_engine_ray.pipelines.funnel import funnel_counts

    def gate(batch: pa.Table) -> pa.Table:
        et, v = batch.column("event_type"), batch.column("value")
        keep = pc.or_(
            pc.and_(pc.equal(et, "view"), pc.greater(v, 0.0)),
            pc.or_(
                pc.and_(pc.equal(et, "click"), pc.greater(v, 150.0)),
                pc.and_(pc.equal(et, "purchase"), pc.greater(v, 250.0))))
        return batch.filter(keep)

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "event_type", "value"]) \
        .map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)
    return funnel_counts(ds, key="user_id", ts_col="ts",
                         type_col="event_type",
                         steps=[s for s, _ in FUNNEL_STEPS],
                         id_col="event_id")


def events_users_intersect(sf_dir: str) -> pa.Table:
    """SQL INTERSECT via relational.dataset_intersect: users with a
    purchase > 200 who also had an error > 200."""
    from web_search_engine_ray.pipelines.relational import dataset_intersect
    path = os.path.join(sf_dir, "events.parquet")
    left = ray.data.read_parquet(
        path, columns=["user_id", "event_type", "value"]) \
        .filter(expr="event_type == 'purchase' and value > 200.0")
    right = ray.data.read_parquet(
        path, columns=["user_id", "event_type", "value"]) \
        .filter(expr="event_type == 'error' and value > 200.0")
    out = dataset_intersect(left, right, keys=["user_id"])
    return _collect(out).sort_by([("user_id", "ascending")])


def events_users_except(sf_dir: str) -> pa.Table:
    """SQL EXCEPT via relational.dataset_except: users with a view but
    no purchase > 300."""
    from web_search_engine_ray.pipelines.relational import dataset_except
    path = os.path.join(sf_dir, "events.parquet")
    left = ray.data.read_parquet(
        path, columns=["user_id", "event_type"]) \
        .filter(expr="event_type == 'view'")
    right = ray.data.read_parquet(
        path, columns=["user_id", "event_type", "value"]) \
        .filter(expr="event_type == 'purchase' and value > 300.0")
    out = dataset_except(left, right, keys=["user_id"])
    return _collect(out).sort_by([("user_id", "ascending")])


def tpch_top_suppliers(sf_dir: str) -> pa.Table:
    """Top-10 suppliers by lineitem revenue — fact-side combiner +
    driver-side dimension join (relational.top_suppliers)."""
    from web_search_engine_ray.pipelines.relational import top_suppliers
    line = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_suppkey", "l_extendedprice", "l_discount"])
    supp = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                         columns=["s_suppkey", "s_name"])
    return top_suppliers(line, supp, k=10)


def docs_entropy(sf_dir: str) -> pa.Table:
    """Per-doc token-distribution Shannon entropy (nats) — the
    vocabulary-diversity quality signal (analysis.token_entropy_batch,
    batch-vectorized factorize + double reduceat)."""
    from web_search_engine_ray.pipelines.analysis import token_entropy_batch
    ds = _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        token_entropy_batch, batch_format="pyarrow", zero_copy_batch=True)
    return _collect(ds).sort_by([("doc_id", "ascending")])


def users_event_seq(sf_dir: str) -> pa.Table:
    """Per-user ordered event-type sequence — exercises
    analytic.string_agg_by_key (string_agg ... ORDER BY ts, id)."""
    from web_search_engine_ray.pipelines.analytic import string_agg_by_key
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type", "ts", "event_id"])
    out = string_agg_by_key(ds, key="user_id", val_col="event_type",
                            ts_col="ts", id_col="event_id")
    return _collect(out).sort_by([("user_id", "ascending")])


def docs_dist_rank(sf_dir: str) -> pa.Table:
    """PERCENT_RANK / CUME_DIST of docs per language by token count
    (DESC) — exercises analytic.dist_rank_in_key; the tie-heavy integer
    n_tokens column makes cume_dist genuinely step-shaped."""
    from web_search_engine_ray.pipelines.analysis import doc_tokens_batch
    from web_search_engine_ray.pipelines.analytic import dist_rank_in_key

    def with_lang(batch: pa.Table) -> pa.Table:
        toks = doc_tokens_batch(batch)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "lang": batch.column("lang"),
                         "n_tokens": toks.column("n_tokens")})

    ds = _docs_ds(sf_dir, ["doc_id", "lang", "text"]).map_batches(
        with_lang, batch_format="pyarrow", zero_copy_batch=True)
    out = dist_rank_in_key(ds, key="lang", order_col="n_tokens",
                           id_col="doc_id", descending=True)
    return _collect(out).sort_by([("doc_id", "ascending")])


def dedup_clusters(sf_dir: str) -> pa.Table:
    """Near-dup CLUSTERS: connected components over the minhash-
    verified pair graph (canonical = min doc_id per component) — the
    form a dedup actually consumes (keep canonical, drop members)."""
    from web_search_engine_ray.pipelines.analysis import (
        connected_components, near_dup_pairs)
    pairs = near_dup_pairs(_docs_ds(sf_dir, ["doc_id", "text"]),
                           _documents_path(sf_dir), threshold=0.8)
    return connected_components(pairs)


def events_resample(sf_dir: str) -> pa.Table:
    """Hourly resample per user with gap filling (window.resample_ffill):
    dense bucket grid per user, count 0 in gaps, value forward-filled."""
    from web_search_engine_ray.pipelines.window import resample_ffill
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id", "ts", "value"])
    out = resample_ffill(ds, key="user_id", ts_col="ts",
                         value_col="value", width_us=3_600_000_000)
    return _collect(out).sort_by([("user_id", "ascending"),
                                  ("bucket_ts", "ascending")])


def docs_weighted_sample(sf_dir: str) -> pa.Table:
    """Deterministic weighted sample (A-Res, weight = n_chars) —
    exercises sampling.weighted_sample's blockwise-candidate top-k."""
    from web_search_engine_ray.pipelines.sampling import weighted_sample
    return weighted_sample(_docs_ds(sf_dir, ["doc_id", "n_chars"]),
                           id_col="doc_id", weight_col="n_chars", k=30)


def knn_ivfpq(sf_dir: str) -> pa.Table:
    """Full IVFADC (pipelines/pq.py:build_ivfpq_index): coarse
    centroids partition storage into bucket dirs, residual PQ codes
    compress each vector 16x; the probe reads ONLY the probed buckets'
    uint8 code columns (~nprobe/n_centroids of 1/16th the bytes).
    Rows-only; pinned by a recall@10 >= 0.7 pytest (0.82 measured at
    sf0.01 with nprobe=4/16)."""
    from web_search_engine_ray.pipelines.knn import _batch_matrix
    from web_search_engine_ray.pipelines.pq import (build_ivfpq_index,
                                                    knn_ivfpq_indexed)
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qtbl = pq.read_table(emb_path, filters=[("vec_id", "in", [0, 1, 2, 3, 4])])
    order = np.argsort(qtbl.column("vec_id").to_numpy())
    qmat = _batch_matrix(qtbl)[order]
    key = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    idx = f"/tmp/wse_ivfpq_{key}"
    ds = ray.data.read_parquet(emb_path, columns=["vec_id", "embedding"])
    build_ivfpq_index(ds, idx, n_centroids=16)
    return knn_ivfpq_indexed(idx, [0, 1, 2, 3, 4], qmat, k=10, nprobe=4)


def docs_cube(sf_dir: str) -> pa.Table:
    """GROUP BY CUBE(lang, source) — all 4 grouping sets from one
    streaming finest-level pass (relational.cube_counts)."""
    from web_search_engine_ray.pipelines.relational import cube_counts
    return cube_counts(_docs_ds(sf_dir, ["lang", "source"]),
                       ["lang", "source"])


def events_mode(sf_dir: str) -> pa.Table:
    """Per-user modal event type (ties by type ascending) — exercises
    window.mode_by_key (combiner partials + one hash exchange)."""
    from web_search_engine_ray.pipelines.window import mode_by_key
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id", "event_type"])
    out = mode_by_key(ds, key="user_id", val_col="event_type")
    return _collect(out).sort_by([("user_id", "ascending")])


def docs_regex(sf_dir: str) -> pa.Table:
    """F1-class regex extraction as pure Arrow kernels (zero Python in
    the loop): first s-word per doc + count of s-words."""
    import pyarrow.compute as pc

    def ex(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(batch.column("text"))
        st = pc.extract_regex(low, r"(?P<w>\bs[a-z]+)")
        first = pc.struct_field(st, "w")
        n = pc.count_substring_regex(low, r"\bs[a-z]+")
        return pa.table({"doc_id": batch.column("doc_id"),
                         "first_s_word": first,
                         "n_s_words": n.cast(pa.int64())})

    ds = _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        ex, batch_format="pyarrow", zero_copy_batch=True)
    return _collect(ds).sort_by([("doc_id", "ascending")])


def events_corr(sf_dir: str) -> pa.Table:
    """Per-type Pearson correlation between value and the props-JSON
    field k — streaming moment partials (n, Σx, Σy, Σxx, Σyy, Σxy per
    type per batch), combined driver-side (|types| rows)."""
    import json as _json

    def _mom(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        # JSON parse loop is the pinned-semantics exception (events_json
        # precedent); the moment accumulation below is vectorized
        ks = np.asarray([float(_json.loads(p)["k"]) for p in
                         batch.column("props").to_pylist()])
        v = batch.column("value").to_numpy().astype(np.float64)
        enc = pc.dictionary_encode(batch.column("event_type")) \
            .combine_chunks()
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False),
                           np.int64)
        tdict = enc.dictionary.to_pylist()
        m = np.zeros((len(tdict), 6))
        np.add.at(m, codes, np.stack(
            [np.ones_like(v), v, ks, v * v, ks * ks, v * ks], axis=1))
        return pa.table({
            "event_type": pa.array(tdict, pa.string()),
            "mom": pa.array(list(m), pa.list_(pa.float64()))})

    acc: dict[str, np.ndarray] = {}
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "value", "props"]).map_batches(
            _mom, batch_format="pyarrow", zero_copy_batch=True)
    for t in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        for ty, m in zip(t.column("event_type").to_pylist(),
                         t.column("mom").to_pylist()):
            acc[ty] = acc.get(ty, np.zeros(6)) + np.asarray(m)
    types = sorted(acc)
    out = []
    for ty in types:
        n, sx, sy, sxx, syy, sxy = acc[ty]
        cov = sxy - sx * sy / n
        vx, vy = sxx - sx * sx / n, syy - sy * sy / n
        out.append(round(cov / np.sqrt(vx * vy), 6))
    return pa.table({"event_type": pa.array(types, pa.string()),
                     "corr_vk": pa.array(out, pa.float64())})


def knn_pq(sf_dir: str) -> pa.Table:
    """Approximate cosine top-10 over product-quantized codes
    (pipelines/pq.py): train 16x256 codebooks, encode to 16 uint8
    codes/vector (16x compression of 64-dim float32), score via ADC
    lookup tables.  Rows-only like knn_ivf — approximate by
    construction; pinned by a recall@10 >= 0.7 pytest against
    knn_bruteforce (measured 0.80 at sf0.01), not a hash oracle."""
    from web_search_engine_ray.pipelines.pq import (knn_pq_adc, pq_encode,
                                                    train_pq_codebooks)
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qtbl = pq.read_table(emb_path, filters=[("vec_id", "in", [0, 1, 2, 3, 4])])
    order = np.argsort(qtbl.column("vec_id").to_numpy())
    from web_search_engine_ray.pipelines.knn import _batch_matrix
    qmat = _batch_matrix(qtbl)[order]
    ds = ray.data.read_parquet(emb_path, columns=["vec_id", "embedding"])
    books = train_pq_codebooks(ds, dim=64)
    return knn_pq_adc(pq_encode(ds, books), books, [0, 1, 2, 3, 4], qmat,
                      k=10)


def heavy_trigrams(sf_dir: str) -> pa.Table:
    """Exact top-20 trigrams via Misra-Gries candidates + exact recount
    (pipelines/heavy.py) — the bounded-state heavy-hitter path for key
    spaces that grow with the corpus (m=16384 clears the N/(m+1)
    exactness bound at every sf: the k-th trigram's count/N ratio is
    scale-invariant in this corpus)."""
    from web_search_engine_ray.pipelines.heavy import heavy_ngrams
    return heavy_ngrams(_docs_ds(sf_dir, ["text"]), n=3, k=20, m=16384)


def events_histogram(sf_dir: str) -> pa.Table:
    """Fixed-width (25.0) histogram of event values — exercises
    quantiles.value_histogram (shuffle-free, bin-bounded driver state)."""
    from web_search_engine_ray.pipelines.quantiles import value_histogram
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["value"])
    return value_histogram(ds, col="value", origin=0.0, width=25.0)


def events_first_last(sf_dir: str) -> pa.Table:
    """Per-user FIRST_VALUE/LAST_VALUE of value ordered by (ts,
    event_id) — window.first_last_by_key (extremal-row combiner: the
    exchange ships <= 2 rows per user per block)."""
    from web_search_engine_ray.pipelines.window import first_last_by_key
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_id", "user_id", "ts",
                                        "value"])
    out = first_last_by_key(ds, key="user_id", ts_col="ts",
                            val_col="value", id_col="event_id")
    return _collect(out).sort_by([("user_id", "ascending")])


def events_full_outer(sf_dir: str) -> pa.Table:
    """FULL OUTER hash join (grouping.hash_join how="full"): per-user
    high-value event counts vs per-user low-value error counts — each
    side is sparse, so unmatched rows survive from BOTH sides with the
    key coalesced and the other side's count null-filled to 0."""
    import pyarrow.compute as pc
    from web_search_engine_ray.functions.grouping import hash_join

    ev = os.path.join(sf_dir, "events.parquet")

    def _rename(name):
        def f(b: pa.Table) -> pa.Table:
            return b.rename_columns(["user_id", name])
        return f

    # each count side MATERIALIZES before the join: two parallel
    # groupby-shuffle branches feeding the join's union-shuffle in ONE
    # streaming plan can deadlock on small CPU budgets (the three
    # shuffles' aggregator actors starve the upstream map tasks —
    # reproduced at num_cpus=4); sequential execution needs one
    # shuffle's actors at a time, and the sides are aggregate-sized
    a = ray.data.read_parquet(
        ev, columns=["user_id"],
        filter=pc.field("value") > 250.0).groupby("user_id").count() \
        .map_batches(_rename("n_hi"), batch_format="pyarrow") \
        .materialize()
    b = ray.data.read_parquet(
        ev, columns=["user_id"],
        filter=(pc.field("event_type") == "error")
        & (pc.field("value") < 15.0)).groupby("user_id").count() \
        .map_batches(_rename("n_err"), batch_format="pyarrow") \
        .materialize()

    def _fill(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t.column("user_id"),
            "n_hi": pc.fill_null(t.column("n_hi"), 0),
            "n_err": pc.fill_null(t.column("n_err"), 0)})

    out = hash_join(a, b, on="user_id", how="full").map_batches(
        _fill, batch_format="pyarrow")
    return _collect(out).sort_by([("user_id", "ascending")])


def events_regr(sf_dir: str) -> pa.Table:
    """Per-type OLS regression of the props-JSON field k on value
    (stats.grouped_linreg): streaming moment partials, driver combine
    is |types| x 6."""
    import json as _json

    from web_search_engine_ray.pipelines.stats import grouped_linreg

    def _k(batch: pa.Table) -> pa.Table:
        ks = np.asarray([float(_json.loads(p)["k"]) for p in
                         batch.column("props").to_pylist()])
        return pa.table({"event_type": batch.column("event_type"),
                         "value": batch.column("value"),
                         "k": pa.array(ks, pa.float64())})

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "value", "props"]).map_batches(
            _k, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_linreg(ds, key="event_type", x_col="value", y_col="k")


def lineitem_unpivot(sf_dir: str) -> pa.Table:
    """Melt (relational.unpivot): wide lineitem measures stack into
    (l_orderkey, l_linenumber, metric, value) long form — the SQL
    UNPIVOT / UNION ALL, filtered at the read (predicate pushdown)."""
    import pyarrow.compute as pc
    from web_search_engine_ray.pipelines.relational import unpivot
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_quantity",
                 "l_extendedprice", "l_discount"],
        filter=pc.field("l_orderkey") < 100)
    out = unpivot(ds, ["l_orderkey", "l_linenumber"],
                  ["l_quantity", "l_extendedprice", "l_discount"])
    return _collect(out).sort_by([
        ("l_orderkey", "ascending"), ("l_linenumber", "ascending"),
        ("metric", "ascending")])


def emb_dim_stats(sf_dir: str) -> pa.Table:
    """Per-dimension mean/stddev of the embedding column
    (vectors.dim_stats) — explode-then-aggregate with dim x 3 partials
    instead of a materialized long form."""
    from web_search_engine_ray.pipelines.vectors import dim_stats
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["embedding"])
    return dim_stats(ds, vec_col="embedding")


def events_new_users(sf_dir: str) -> pa.Table:
    """Daily acquisition counts (cohort.new_users_per_day): per-user
    min-ts combiner, one hash exchange, |days| driver state."""
    from web_search_engine_ray.pipelines.cohort import new_users_per_day
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id", "ts"])
    return new_users_per_day(ds, user_col="user_id", ts_col="ts")


def events_retention(sf_dir: str) -> pa.Table:
    """Cohort retention matrix (cohort.retention_matrix): distinct
    (user, day) combiner, one hash exchange on user, |days|^2 driver
    state."""
    from web_search_engine_ray.pipelines.cohort import retention_matrix
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id", "ts"])
    return retention_matrix(ds, user_col="user_id", ts_col="ts")


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_pivot_sum(sf_dir: str) -> pa.Table:
    """SUM-valued crosstab (relational.pivot_sum): per user one float64
    column per pinned event type holding its value sum."""
    from web_search_engine_ray.pipelines.relational import pivot_sum
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id", "event_type", "value"])
    return pivot_sum(ds, row_key="user_id", col_key="event_type",
                     value_col="value", categories=EVENT_TYPES)


def customer_nation_broadcast(sf_dir: str) -> pa.Table:
    """Fact x dimension via grouping.broadcast_join: the nation table
    is ray.put once and every map task joins its customer batch
    map-side — zero shuffle of the fact side; the aggregate after the
    join is a per-batch combiner too."""
    from web_search_engine_ray.functions.grouping import broadcast_join
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                           columns=["n_nationkey", "n_name"]) \
        .rename_columns(["c_nationkey", "n_name"])
    cust = ray.data.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                                 columns=["c_custkey", "c_nationkey",
                                          "c_acctbal"])
    joined = broadcast_join(cust, nation, on="c_nationkey")

    def _partial(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(b.select(["n_name", "c_acctbal"]),
                            ["n_name"]).aggregate(
            [([], "count_all"), ("c_acctbal", "sum")])
        return g.rename_columns(["n_name", "n", "s"])

    acc: dict[str, list] = {}
    for b in joined.map_batches(_partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for nm, n, s in zip(b.column("n_name").to_pylist(),
                            b.column("n").to_pylist(),
                            b.column("s").to_pylist()):
            a = acc.setdefault(nm, [0, 0.0])
            a[0] += n
            a[1] += s
    names = sorted(acc)
    return pa.table({
        "n_name": pa.array(names, pa.string()),
        "n_customers": pa.array([acc[n][0] for n in names], pa.int64()),
        "avg_acctbal": pa.array([round(acc[n][1] / acc[n][0], 6)
                                 for n in names], pa.float64())})


def events_latest(sf_dir: str) -> pa.Table:
    """Log-compaction / last-write-wins: each user's LATEST event row
    (ts desc, event_id tie-break) — group_topk k=1 with the blockwise
    pre-prune, so the exchange ships one candidate row per user per
    block."""
    from web_search_engine_ray.pipelines.window import group_topk
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_id", "user_id", "ts",
                                        "value"])
    out = group_topk(ds, key="user_id", order_col="ts", k=1,
                     ascending=False, id_col="event_id")
    return out.select(["user_id", "event_id", "ts", "value"]) \
        .sort_by([("user_id", "ascending")])


def events_daily_active(sf_dir: str) -> pa.Table:
    """Daily active users (exact COUNT DISTINCT per day): derive the
    day key per batch, then distinct.count_distinct's pair-keyed
    exchange."""
    from web_search_engine_ray.pipelines.distinct import count_distinct

    def _day(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        day = (ts // 86_400_000_000) * 86_400_000_000
        return pa.table({
            "day": pa.array(day.view("datetime64[us]"),
                            pa.timestamp("us")),
            "user_id": batch.column("user_id")})

    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["ts", "user_id"]).map_batches(
        _day, batch_format="pyarrow", zero_copy_batch=True)
    return count_distinct(ds, key="day", col="user_id")


def events_profile(sf_dir: str) -> pa.Table:
    """Numeric column profiler (profile.profile_numeric): one
    streaming pass, |cols| x 6 driver state — the pre/post-transform
    DESCRIBE of a curation run.  Profiled columns are continuous
    (value) or exact-integer (user_id, event_id): a round-6 mean of
    DISCRETE-decimal data (e.g. l_discount's 0.01 steps) sits exactly
    on a rounding half-boundary where summation-order noise flips the
    last digit between any two engines — not oracle-comparable."""
    from web_search_engine_ray.pipelines.profile import profile_numeric
    cols = ["event_id", "user_id", "value"]
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=cols)
    return profile_numeric(ds, cols)


def events_quantiles_cont(sf_dir: str) -> pa.Table:
    """INTERPOLATED quantiles (SQL quantile_cont) — the percentile_cont
    counterpart of events_quantiles, via quantiles.exact_quantiles_cont
    (histogram passes target the two order statistics each q
    interpolates between; no global sort)."""
    from web_search_engine_ray.pipelines.quantiles import \
        exact_quantiles_cont
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["value"])
    return exact_quantiles_cont(ds, "value",
                                [0.05, 0.25, 0.5, 0.75, 0.95, 0.99])


def emb_cov(sf_dir: str) -> pa.Table:
    """Streaming Gram-matrix covariance (stats.vector_cov): population
    covariance of the first 6 embedding dimensions — each batch
    reduces to one 6x6 X^T X partial."""
    from web_search_engine_ray.pipelines.stats import vector_cov
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["embedding"])
    return vector_cov(ds, vec_col="embedding", dims=6)


def events_weighted_mean(sf_dir: str) -> pa.Table:
    """Per-type weighted mean of value weighted by the props-JSON k
    (stats.grouped_weighted_mean — same moments pass as events_regr)."""
    import json as _json

    from web_search_engine_ray.pipelines.stats import grouped_weighted_mean

    def _k(batch: pa.Table) -> pa.Table:
        ks = np.asarray([float(_json.loads(p)["k"]) for p in
                         batch.column("props").to_pylist()])
        return pa.table({"event_type": batch.column("event_type"),
                         "value": batch.column("value"),
                         "k": pa.array(ks, pa.float64())})

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "value", "props"]).map_batches(
            _k, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_weighted_mean(ds, key="event_type", val_col="value",
                                 weight_col="k")


def orders_monthly(sf_dir: str) -> pa.Table:
    """Calendar-month rollup (irregular-width windows — months are not
    a fixed microsecond multiple, so this is pc.floor_temporal, not the
    tumbling-window arithmetic): per month order count + revenue sum.
    Per-batch combiner partials; driver state is |months| rows."""
    import pyarrow.compute as pc

    def _partial(b: pa.Table) -> pa.Table:
        month = pc.floor_temporal(b.column("o_orderdate"), unit="month")
        g = pa.TableGroupBy(pa.table({
            "month": month, "p": b.column("o_totalprice")}),
            ["month"]).aggregate([([], "count_all"), ("p", "sum")])
        return g.rename_columns(["month", "n", "s"])

    acc: dict = {}
    ds = ray.data.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                               columns=["o_orderdate", "o_totalprice"])
    for b in ds.map_batches(_partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        for m, n, s in zip(b.column("month").to_pylist(),
                           b.column("n").to_pylist(),
                           b.column("s").to_pylist()):
            a = acc.setdefault(m, [0, 0.0])
            a[0] += n
            a[1] += s
    months = sorted(acc)
    return pa.table({
        "month": pa.array(months, pa.timestamp("us")),
        "n_orders": pa.array([acc[m][0] for m in months], pa.int64()),
        "revenue": pa.array([round(acc[m][1], 6) for m in months],
                            pa.float64())})


def events_quantiles_by_type_cont(sf_dir: str) -> pa.Table:
    """Per-type INTERPOLATED quantiles (quantiles.grouped_quantiles_cont
    — one exchange, vectorized two-neighbor gather per (key, q))."""
    from web_search_engine_ray.pipelines.quantiles import \
        grouped_quantiles_cont
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_type", "value"])
    return grouped_quantiles_cont(ds, key="event_type", col="value",
                                  qs=[0.1, 0.5, 0.9])


def events_rolling_time(sf_dir: str) -> pa.Table:
    """TIME-based (RANGE-framed) rolling mean — trailing 1-hour window
    per user, equal-ts peers included (analytic.rolling_mean_range)."""
    from web_search_engine_ray.pipelines.analytic import rolling_mean_range
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_id", "user_id", "ts",
                                        "value"])
    out = rolling_mean_range(ds, key="user_id", ts_col="ts",
                             val_col="value", id_col="event_id",
                             interval_us=3_600_000_000)
    return _collect(out).sort_by([("event_id", "ascending")])


def events_type_share(sf_dir: str) -> pa.Table:
    """Ratio-to-report: each type's share of total events and of total
    value — the ``n / sum(n) OVER ()`` window idiom as a two-level
    aggregate (per-batch combiner partials, |types| driver rows, the
    totals computed FROM the partials — no second pass)."""
    def _partial(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(b.select(["event_type", "value"]),
                            ["event_type"]).aggregate(
            [([], "count_all"), ("value", "sum")])
        return g.rename_columns(["event_type", "n", "s"])

    acc: dict[str, list] = {}
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_type", "value"])
    for b in ds.map_batches(_partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        for t, n, s in zip(b.column("event_type").to_pylist(),
                           b.column("n").to_pylist(),
                           b.column("s").to_pylist()):
            a = acc.setdefault(t, [0, 0.0])
            a[0] += n
            a[1] += s
    types = sorted(acc)
    n_tot = sum(acc[t][0] for t in types)
    s_tot = sum(acc[t][1] for t in types)
    return pa.table({
        "event_type": pa.array(types, pa.string()),
        "n_events": pa.array([acc[t][0] for t in types], pa.int64()),
        "share_n": pa.array([round(acc[t][0] / n_tot, 6)
                             for t in types], pa.float64()),
        "share_value": pa.array([round(acc[t][1] / s_tot, 6)
                                 for t in types], pa.float64())})


def part_brand_stats(sf_dir: str) -> pa.Table:
    """Per-brand part stats (completes 10/10 testdata-table coverage):
    count, DISTINCT type count (distinct.count_distinct's pair-keyed
    exchange), retail sum (a sum of hundredths is 6-decimal-safe,
    unlike its mean — see events_profile), max size.  Aggregates are
    per-batch combiners; the driver combine is |brands| rows."""
    from web_search_engine_ray.pipelines.distinct import count_distinct
    path = os.path.join(sf_dir, "part.parquet")

    def _partial(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(b.select(["p_brand", "p_retailprice",
                                      "p_size"]), ["p_brand"]) \
            .aggregate([([], "count_all"), ("p_retailprice", "sum"),
                        ("p_size", "max")])
        return g.rename_columns(["p_brand", "n", "s", "mx"])

    acc: dict[str, list] = {}
    for b in ray.data.read_parquet(
            path, columns=["p_brand", "p_retailprice", "p_size"]) \
            .map_batches(_partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        for br, n, s, mx in zip(b.column("p_brand").to_pylist(),
                                b.column("n").to_pylist(),
                                b.column("s").to_pylist(),
                                b.column("mx").to_pylist()):
            a = acc.setdefault(br, [0, 0.0, -1])
            a[0] += n
            a[1] += s
            a[2] = max(a[2], mx)
    types = count_distinct(
        ray.data.read_parquet(path, columns=["p_brand", "p_type"]),
        key="p_brand", col="p_type")
    ntypes = dict(zip(types.column("p_brand").to_pylist(),
                      types.column("n_distinct").to_pylist()))
    brands = sorted(acc)
    return pa.table({
        "p_brand": pa.array(brands, pa.string()),
        "n_parts": pa.array([acc[b][0] for b in brands], pa.int64()),
        "n_types": pa.array([ntypes[b] for b in brands], pa.int64()),
        "retail_sum": pa.array([round(acc[b][1], 6) for b in brands],
                               pa.float64()),
        "max_size": pa.array([acc[b][2] for b in brands], pa.int64())})


from web_search_engine_ray.functions.textproc import STOPWORDS  # noqa: E402
from web_search_engine_ray.pipelines.curation import DECONTAM_K  # noqa: E402

_STOPLIST_SQL = "','".join(sorted(STOPWORDS))

ORACLE_SQL: dict[str, str] = {
    "bm25_topk": _bm25_sql(),
    # merge_bm25 reproduces bm25_topk's docIDs exactly (append remap at
    # the dense split point) — same oracle, checked independently
    "merge_bm25": _bm25_sql(),
    "doc_lengths": (
        "SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+'))"
        "::BIGINT AS n_tokens FROM documents ORDER BY doc_id"),
    "corpus_stats": f"""
WITH toks AS ({_TOKS}), dl AS (SELECT doc_id, count(*)::BIGINT dl FROM toks GROUP BY 1)
SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
       sum(dl)::BIGINT AS total_tokens,
       round(sum(dl)::DOUBLE / (SELECT count(*) FROM documents), 6) AS avgdl
FROM dl""",
    "term_df": f"""
WITH toks AS ({_TOKS})
SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS cf
FROM toks GROUP BY term ORDER BY term""",
    "top_terms": f"""
WITH toks AS ({_TOKS})
SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS cf
FROM toks GROUP BY term ORDER BY cf DESC, term LIMIT 25""",
    "dedup_exact": """
SELECT min(doc_id)::BIGINT AS doc_id, count(*)::BIGINT AS n_copies
FROM documents GROUP BY text ORDER BY doc_id""",
    "fingerprint": """
SELECT doc_id, md5(lower(text)) AS fingerprint FROM documents ORDER BY doc_id""",
    "quality_score": f"""
SELECT doc_id,
       len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT AS n_tokens,
       length(text)::BIGINT AS n_chars,
       round(CASE WHEN len(regexp_extract_all(lower(text), '[a-z0-9]+')) = 0
             THEN 0.0 ELSE
             len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                 x -> x IN ('{_STOPLIST_SQL}')))::DOUBLE
             / len(regexp_extract_all(lower(text), '[a-z0-9]+')) END, 6)
         AS stopword_ratio
FROM documents ORDER BY doc_id""",
    "lang_distribution": """
SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY lang
ORDER BY lang""",
    "knn_cosine": """
WITH q AS (SELECT vec_id qid, CAST(embedding AS DOUBLE[]) qe
           FROM embeddings WHERE vec_id IN (0,1,2,3,4)),
sims AS (
  SELECT q.qid AS query_id, e.vec_id,
         list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[]))::DOUBLE AS sim
  FROM q CROSS JOIN embeddings e)
SELECT query_id::BIGINT AS query_id,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, vec_id) AS INTEGER) AS rank,
       vec_id, round(sim, 6) AS sim
FROM sims QUALIFY rank <= 10 ORDER BY query_id, rank""",
    "events_by_type": """
SELECT event_type, count(*)::BIGINT AS n_events,
       round(sum(value), 6) AS total_value
FROM events GROUP BY event_type ORDER BY event_type""",
    "events_json": """
SELECT event_type, count(*)::BIGINT AS n_events,
       sum(CAST(props->>'k' AS BIGINT))::BIGINT AS sum_k
FROM events GROUP BY event_type ORDER BY event_type""",
    "ngram_jaccard": _jaccard_sql(0.5),
    "dedup_minhash": _jaccard_sql(0.8),
    "dedup_simhash": _simhash_sql(3),
    "lang_id": _lang_id_sql(),
    "media_features": _MEDIA_SQL,
    "transcripts_bm25": _transcripts_bm25_sql(),
    "dedup_embedding": """
WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings)
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
       round(list_cosine_similarity(a.e, b.e), 6) AS sim
FROM q a JOIN q b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.e, b.e) >= 0.45
ORDER BY 1, 2""",
    "winnow_fingerprint": """
WITH d AS (SELECT doc_id, regexp_extract_all(lower(text),'[a-z0-9]+') toks
           FROM documents),
sh AS (SELECT doc_id, i.i AS pos,
              md5(concat_ws(' ', toks[i.i], toks[i.i+1], toks[i.i+2])) AS h,
              len(toks) - 2 AS n_sh
       FROM d CROSS JOIN LATERAL (SELECT unnest(range(1, len(toks)-1)) AS i) i
       WHERE len(toks) >= 3),
wmin AS (SELECT doc_id, pos, n_sh,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh
         FROM sh)
SELECT DISTINCT doc_id, mh AS fp_hash
FROM wmin WHERE pos <= n_sh - 3
ORDER BY doc_id, fp_hash""",
    "token_stats": r"""
SELECT doc_id,
       len(regexp_extract_all(text, '\S+'))::BIGINT AS n_ws_tokens,
       len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT AS n_tokens,
       len(regexp_extract_all(lower(text), '[a-z0-9]{1,4}'))::BIGINT
         AS n_subwords,
       len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')))
         ::BIGINT AS n_unique_terms
FROM documents ORDER BY doc_id""",
    "media_wav": """
SELECT doc_id AS media_id, 'audio' AS kind, CAST(1 AS INTEGER) AS width,
       CAST(16 AS INTEGER) AS height,
       CAST(octet_length(encode(text)) // 2 AS INTEGER) AS n_frames
FROM documents ORDER BY media_id""",
    "docs_sample": """
SELECT doc_id, text, lang FROM documents WHERE doc_id % 16 = 0
ORDER BY doc_id""",
    "quality_topk_per_lang": """
WITH d AS (SELECT lang, doc_id,
           len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT
             AS n_tokens
           FROM documents),
r AS (SELECT lang, doc_id, n_tokens,
      CAST(row_number() OVER (PARTITION BY lang
                              ORDER BY n_tokens DESC, doc_id) AS INTEGER)
        AS rank
      FROM d)
SELECT lang, doc_id, n_tokens, rank FROM r WHERE rank <= 3
ORDER BY lang, rank""",
    "events_hourly": """
SELECT event_type, date_trunc('hour', ts) AS window_start,
       count(*)::BIGINT AS n_events, round(sum(value), 6) AS total_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "events_sessionize": """
WITH gaps AS (SELECT user_id, ts,
  CASE WHEN lag(ts) OVER w IS NULL
            OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
       THEN 1 ELSE 0 END AS new_s,
  CASE WHEN lag(ts) OVER w IS NULL
            OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
       THEN 1 ELSE 0 END AS s_start
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
sess AS (SELECT user_id, ts,
         sum(s_start) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS session_id
         FROM gaps),
per_sess AS (SELECT user_id, session_id, count(*) sz FROM sess GROUP BY 1, 2)
SELECT user_id, count(*)::BIGINT AS n_sessions,
       sum(sz)::BIGINT AS n_events,
       max(sz)::BIGINT AS max_session_events
FROM per_sess GROUP BY user_id ORDER BY user_id""",
    "decontam": _decontam_sql(DECONTAM_K),
    "curated_corpus": _curated_sql(DECONTAM_K, 0.1),
    "split_docs": _split_sql(0.1),
    "repetition": _REPETITION_SQL,
    "phrase_match": _phrase_sql(),
    "phrase_match_pos": _phrase_sql(),
    "top_bigrams": _TOP_BIGRAMS_SQL,
    "pmi_bigrams": _PMI_SQL,
    "tfidf_keywords": _TFIDF_SQL,
    "tpch_pricing": """
SELECT l_returnflag, l_linestatus,
  round(sum(l_quantity), 6) AS sum_qty,
  round(sum(l_extendedprice), 2) AS sum_base_price,
  round(sum(l_extendedprice*(1-l_discount)), 2) AS sum_disc_price,
  round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)), 2) AS sum_charge,
  round(avg(l_quantity), 6) AS avg_qty,
  round(avg(l_extendedprice), 6) AS avg_price,
  round(avg(l_discount), 6) AS avg_disc,
  count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus""",
    "tpch_shipping": """
SELECT l_orderkey AS o_orderkey,
  round(sum(l_extendedprice*(1-l_discount)), 2) AS revenue,
  o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey LIMIT 10""",
    "tpch_nation_revenue": """
SELECT n_name,
  round(sum(l_extendedprice*(1-l_discount)), 2) AS revenue
FROM region
JOIN nation ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "orders_unfulfilled": """
SELECT o_orderkey, o_totalprice FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey)
ORDER BY o_orderkey""",
    "customer_orders_left": """
SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
WHERE c.c_custkey <= 100
ORDER BY c.c_custkey, o.o_orderkey""",
    "events_cumsum": """
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 6)
         AS running_sum,
       CAST(row_number() OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS BIGINT)
         AS running_n
FROM events ORDER BY event_id""",
    "events_lag": """
SELECT event_id, user_id,
       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS lag_ts
FROM events ORDER BY event_id""",
    "events_rolling": """
SELECT event_id, user_id,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6)
         AS rolling_mean
FROM events ORDER BY event_id""",
    "docs_rank": """
WITH s AS (SELECT doc_id, lang,
                  len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT
                    AS n_tokens
           FROM documents)
SELECT doc_id, lang, n_tokens,
       CAST(row_number() OVER (PARTITION BY lang
                               ORDER BY n_tokens DESC, doc_id) AS BIGINT)
         AS row_num,
       CAST(rank() OVER (PARTITION BY lang ORDER BY n_tokens DESC)
            AS BIGINT) AS rnk,
       CAST(dense_rank() OVER (PARTITION BY lang ORDER BY n_tokens DESC)
            AS BIGINT) AS dense_rnk
FROM s ORDER BY doc_id""",
    "docs_rollup": """
SELECT lang, source, count(*)::BIGINT AS n_docs
FROM documents GROUP BY ROLLUP(lang, source)
ORDER BY lang, source""",
    "quality_gate": """
WITH s AS (SELECT doc_id, lang,
                  len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT
                    AS n_tokens
           FROM documents),
m AS (SELECT lang, quantile_disc(n_tokens, 0.5) AS med
      FROM s GROUP BY lang)
SELECT s.doc_id, s.lang, s.n_tokens
FROM s JOIN m USING (lang) WHERE s.n_tokens >= m.med
ORDER BY s.doc_id""",
    "emb_centroids": """
SELECT CAST(label AS BIGINT) AS label, CAST(ord AS BIGINT) AS ord,
       round(avg(val), 6) AS v
FROM (SELECT label, unnest(embedding) AS val,
             generate_subscripts(embedding, 1) AS ord
      FROM embeddings)
GROUP BY label, ord ORDER BY label, ord""",
    "events_banded": """
SELECT e.event_id, e.value, b.label
FROM events e
JOIN (VALUES (0.0, 10.0, 'low'), (5.0, 50.0, 'mid'),
             (50.0, 200.0, 'high'), (200.0, 1000.0, 'extreme'))
     b(lo, hi, label)
  ON e.value >= b.lo AND e.value < b.hi
ORDER BY e.event_id, b.label""",
    "docs_pivot": (
        "SELECT lang, "
        + ", ".join(
            f"count(*) FILTER (WHERE source = '{s}') AS {s}"
            for s in [f"src{i}" for i in range(20)])
        + " FROM documents GROUP BY lang ORDER BY lang"),
    "docs_stratified": """
SELECT doc_id, lang, source FROM documents
QUALIFY row_number() OVER (
  PARTITION BY lang
  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 5
ORDER BY lang, doc_id""",
    "events_quantiles_by_type": (
        "SELECT event_type, q, value FROM ("
        + " UNION ALL ".join(
            f"SELECT event_type, CAST({q} AS DOUBLE) AS q,"
            f" round(quantile_disc(value, {q}), 6) AS value"
            f" FROM events GROUP BY event_type"
            for q in [0.25, 0.5, 0.9])
        + ") ORDER BY event_type, q"),
    "events_distinct_users": """
SELECT event_type, count(DISTINCT user_id) AS n_distinct
FROM events GROUP BY event_type ORDER BY event_type""",
    "events_distinct_pairs": """
SELECT DISTINCT event_type, user_id FROM events
ORDER BY event_type, user_id""",
    "events_asof": """
SELECT l.user_id, l.event_id, l.ts, l.value, r.value AS value_r
FROM (SELECT * FROM events WHERE event_type = 'click') l
ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY l.event_id""",
    "events_hopping": """
SELECT make_timestamp(k * 900000000) AS window_start, event_type,
  round(sum(value), 6) AS sum_value, count(*) AS n
FROM (
  SELECT event_type, value,
    unnest(generate_series(
      (epoch_us(ts) - 3600000000) // 900000000 + 1,
      epoch_us(ts) // 900000000)) AS k
  FROM events)
GROUP BY 1, 2 ORDER BY 1, 2""",
    "events_quantiles": (
        "SELECT q, value FROM ("
        + " UNION ALL ".join(
            f"SELECT CAST({q} AS DOUBLE) AS q,"
            f" round(quantile_disc(value, {q}), 6) AS value FROM events"
            for q in [0.1, 0.25, 0.5, 0.75, 0.9, 0.99])
        + ") ORDER BY q"),
    "events_ntile": """
SELECT event_id, user_id,
       CAST(ntile(4) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS BIGINT) AS tile
FROM events ORDER BY event_id""",
    "events_lead": """
SELECT event_id, user_id,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS lead_ts
FROM events ORDER BY event_id""",
    # greedy earliest-match funnel == nested MIN(ts) chain (see
    # pipelines/funnel.py docstring for the equivalence argument)
    "events_funnel": """
WITH src AS (SELECT * FROM events
             WHERE (event_type = 'view' AND value > 0.0)
                OR (event_type = 'click' AND value > 150.0)
                OR (event_type = 'purchase' AND value > 250.0)),
s1 AS (SELECT user_id, min(ts) AS t FROM src
       WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(e.ts) AS t FROM src e JOIN s1 USING (user_id)
       WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(e.ts) AS t FROM src e JOIN s2 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY e.user_id)
SELECT * FROM (VALUES
  (CAST(1 AS BIGINT), 'view',     CAST((SELECT count(*) FROM s1) AS BIGINT)),
  (CAST(2 AS BIGINT), 'click',    CAST((SELECT count(*) FROM s2) AS BIGINT)),
  (CAST(3 AS BIGINT), 'purchase', CAST((SELECT count(*) FROM s3) AS BIGINT)))
  AS t(step, event_type, n_keys)
ORDER BY step""",
    "events_users_intersect": """
SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 200.0
INTERSECT
SELECT user_id FROM events WHERE event_type = 'error' AND value > 200.0
ORDER BY user_id""",
    "events_users_except": """
SELECT user_id FROM events WHERE event_type = 'view'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 300.0
ORDER BY user_id""",
    "docs_cube": """
SELECT lang, source, count(*)::BIGINT AS n_docs
FROM documents GROUP BY CUBE(lang, source)
ORDER BY lang, source""",
    "events_mode": """
SELECT user_id, event_type AS mode_val, n AS n_mode FROM (
  SELECT user_id, event_type, count(*)::BIGINT AS n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY count(*) DESC, event_type) AS rn
  FROM events GROUP BY user_id, event_type)
WHERE rn = 1 ORDER BY user_id""",
    "docs_regex": """
SELECT doc_id,
       NULLIF(regexp_extract(lower(text), '\\bs[a-z]+'), '')
         AS first_s_word,
       len(regexp_extract_all(lower(text), '\\bs[a-z]+'))::BIGINT
         AS n_s_words
FROM documents ORDER BY doc_id""",
    "events_corr": """
SELECT event_type,
       round(corr(value,
                  CAST(json_extract_string(props, '$.k') AS DOUBLE)), 6)
         AS corr_vk
FROM events GROUP BY event_type ORDER BY event_type""",
    "tpch_top_suppliers": """
WITH r AS (SELECT l_suppkey,
                  round(sum(l_extendedprice * (1 - l_discount)), 2)
                    AS revenue
           FROM lineitem GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, r.revenue
FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey
ORDER BY r.revenue DESC, s.s_suppkey LIMIT 10""",
    "docs_entropy": f"""
WITH toks AS ({_TOKS}),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS c FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, sum(c) AS L FROM tf GROUP BY 1)
SELECT t.doc_id, CAST(d.L AS BIGINT) AS n_tokens,
       round(-sum((t.c / d.L) * ln(t.c / d.L)), 6) AS entropy
FROM tf t JOIN dl d USING (doc_id)
GROUP BY t.doc_id, d.L ORDER BY t.doc_id""",
    "users_event_seq": """
SELECT user_id,
       string_agg(event_type, ',' ORDER BY ts, event_id) AS seq,
       count(*)::BIGINT AS n_vals
FROM events GROUP BY user_id ORDER BY user_id""",
    "docs_dist_rank": """
WITH s AS (SELECT doc_id, lang,
                  len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT
                    AS n_tokens
           FROM documents)
SELECT doc_id, lang, n_tokens,
       round(percent_rank() OVER (PARTITION BY lang
                                  ORDER BY n_tokens DESC), 6) AS pct_rank,
       round(cume_dist() OVER (PARTITION BY lang
                               ORDER BY n_tokens DESC), 6) AS cume_dist
FROM s ORDER BY doc_id""",
    # connected components over the same verified-pair set the
    # dedup_minhash oracle defines; min-label propagation as a
    # recursive CTE
    "dedup_clusters": f"""
WITH RECURSIVE pr AS (SELECT * FROM ({_jaccard_sql(0.8)})),
edges AS (SELECT doc_id_a AS u, doc_id_b AS v FROM pr
          UNION ALL SELECT doc_id_b, doc_id_a FROM pr),
nodes AS (SELECT DISTINCT u AS id FROM edges),
cc(id, lbl) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.v, cc.lbl FROM cc JOIN edges e ON e.u = cc.id)
SELECT id AS doc_id, min(lbl)::BIGINT AS canonical_id
FROM cc GROUP BY id ORDER BY doc_id""",
    "events_resample": """
WITH b AS (SELECT user_id, date_trunc('hour', ts) AS bucket_ts,
                  count(*)::BIGINT AS n, round(sum(value), 6) AS s
           FROM events GROUP BY 1, 2),
bounds AS (SELECT user_id, min(bucket_ts) AS lo, max(bucket_ts) AS hi
           FROM b GROUP BY 1),
grid AS (SELECT user_id,
                unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
                  AS bucket_ts
         FROM bounds),
j AS (SELECT g.user_id, g.bucket_ts, coalesce(b.n, 0) AS n_events, b.s
      FROM grid g LEFT JOIN b USING (user_id, bucket_ts))
SELECT user_id, bucket_ts, n_events,
       last_value(s IGNORE NULLS) OVER (PARTITION BY user_id
                                        ORDER BY bucket_ts) AS v_ffill
FROM j ORDER BY user_id, bucket_ts""",
    # A-Res weighted sampling: identical u derivation on both sides
    # (first 8 md5 hex chars + 1 over 2^32 + 1)
    "docs_weighted_sample": """
WITH s AS (SELECT doc_id, n_chars,
  ln((CAST(concat('0x',
        substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) + 1)
     / 4294967297.0) / n_chars AS akey
  FROM documents),
t AS (SELECT * FROM s ORDER BY akey DESC, doc_id LIMIT 30)
SELECT doc_id, n_chars, round(akey, 6) AS akey FROM t
ORDER BY akey DESC, doc_id""",
    "heavy_trigrams": f"""
WITH toks AS ({_TOKS_POS}),
g AS (SELECT {_gram_expr(3)} AS gram FROM toks),
gc AS (SELECT gram, count(*)::BIGINT AS n_occ FROM g
       WHERE gram IS NOT NULL GROUP BY gram)
SELECT gram, n_occ FROM gc ORDER BY n_occ DESC, gram LIMIT 20""",
    "events_histogram": """
SELECT CAST(floor((value - 0.0) / 25.0) AS BIGINT) AS bin,
       round(CAST(floor((value - 0.0) / 25.0) AS BIGINT) * 25.0, 6)
         AS lo_edge,
       count(*)::BIGINT AS n
FROM events GROUP BY 1 ORDER BY bin""",
    "events_first_last": """
SELECT user_id,
       first(value ORDER BY ts, event_id) AS first_val,
       last(value ORDER BY ts, event_id) AS last_val
FROM events GROUP BY user_id ORDER BY user_id""",
    "events_full_outer": """
WITH a AS (SELECT user_id, count(*)::BIGINT AS n_hi FROM events
           WHERE value > 250.0 GROUP BY 1),
     b AS (SELECT user_id, count(*)::BIGINT AS n_err FROM events
           WHERE event_type = 'error' AND value < 15.0 GROUP BY 1)
SELECT user_id, COALESCE(n_hi, 0) AS n_hi, COALESCE(n_err, 0) AS n_err
FROM a FULL OUTER JOIN b USING (user_id) ORDER BY user_id""",
    "events_regr": """
WITH xy AS (SELECT event_type, value,
                   CAST(props->>'k' AS DOUBLE) AS k FROM events)
SELECT event_type, count(*)::BIGINT AS n_pts,
       round(regr_slope(k, value), 6) AS slope,
       round(regr_intercept(k, value), 6) AS intercept,
       round(regr_r2(k, value), 6) AS r2
FROM xy GROUP BY event_type ORDER BY event_type""",
    "lineitem_unpivot": """
SELECT l_orderkey, l_linenumber, metric, value FROM (
  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
         CAST(l_quantity AS DOUBLE) AS value
  FROM lineitem WHERE l_orderkey < 100
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_extendedprice',
         CAST(l_extendedprice AS DOUBLE)
  FROM lineitem WHERE l_orderkey < 100
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_discount',
         CAST(l_discount AS DOUBLE)
  FROM lineitem WHERE l_orderkey < 100)
ORDER BY l_orderkey, l_linenumber, metric""",
    "emb_dim_stats": """
SELECT CAST(ord AS BIGINT) AS ord, count(*)::BIGINT AS n,
       round(avg(x), 6) AS mean_v, round(stddev_pop(x), 6) AS std_v
FROM (SELECT CAST(unnest(embedding) AS DOUBLE) AS x,
             generate_subscripts(embedding, 1) AS ord
      FROM embeddings)
GROUP BY ord ORDER BY ord""",
    "events_new_users": """
SELECT day, count(*)::BIGINT AS n_new_users FROM (
  SELECT user_id, min(date_trunc('day', ts)) AS day
  FROM events GROUP BY user_id)
GROUP BY day ORDER BY day""",
    "events_retention": """
WITH fs AS (SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
            FROM events GROUP BY user_id),
     act AS (SELECT DISTINCT user_id, date_trunc('day', ts)
               AS active_day FROM events)
SELECT cohort_day, active_day, count(*)::BIGINT AS n_users
FROM fs JOIN act USING (user_id)
GROUP BY cohort_day, active_day ORDER BY cohort_day, active_day""",
    "events_pivot_sum": (
        "SELECT user_id, "
        + ", ".join(
            "round(COALESCE(sum(value) FILTER (WHERE event_type = "
            f"'{t}'), 0.0), 6) AS {t}"
            for t in ["click", "error", "purchase", "signup", "view"])
        + " FROM events GROUP BY user_id ORDER BY user_id"),
    "customer_nation_broadcast": """
SELECT n_name, count(*)::BIGINT AS n_customers,
       round(avg(c_acctbal), 6) AS avg_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name""",
    "events_latest": """
SELECT user_id, event_id, ts, value FROM events
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id) = 1
ORDER BY user_id""",
    "events_daily_active": """
SELECT date_trunc('day', ts) AS day,
       count(DISTINCT user_id) AS n_distinct
FROM events GROUP BY 1 ORDER BY 1""",
    "events_profile": """
WITH m AS (
  SELECT 'event_id' AS "column", CAST(event_id AS DOUBLE) AS v
  FROM events
  UNION ALL SELECT 'user_id', CAST(user_id AS DOUBLE) FROM events
  UNION ALL SELECT 'value', value FROM events)
SELECT "column", count(v)::BIGINT AS n,
       (count(*) - count(v))::BIGINT AS n_null,
       round(avg(v), 6) AS mean, round(stddev_pop(v), 6) AS std,
       round(min(v), 6) AS min_v, round(max(v), 6) AS max_v
FROM m GROUP BY "column" ORDER BY "column\"""",
    "events_quantiles_cont": (
        "SELECT q, value FROM ("
        + " UNION ALL ".join(
            f"SELECT CAST({q} AS DOUBLE) AS q,"
            f" round(quantile_cont(value, {q}), 6) AS value FROM events"
            for q in [0.05, 0.25, 0.5, 0.75, 0.95, 0.99])
        + ") ORDER BY q"),
    "emb_cov": """
WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                  CAST(unnest(embedding) AS DOUBLE) AS x
           FROM embeddings)
SELECT CAST(a.i AS BIGINT) AS di, CAST(b.i AS BIGINT) AS dj,
       round(covar_pop(a.x, b.x), 6) AS cov
FROM u a JOIN u b USING (vec_id)
WHERE a.i <= b.i AND a.i <= 6 AND b.i <= 6
GROUP BY 1, 2 ORDER BY 1, 2""",
    "events_weighted_mean": """
WITH xy AS (SELECT event_type, value,
                   CAST(props->>'k' AS DOUBLE) AS k FROM events)
SELECT event_type, count(*)::BIGINT AS n_pts,
       round(sum(value * k) / sum(k), 6) AS wmean
FROM xy GROUP BY event_type ORDER BY event_type""",
    "orders_monthly": """
SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
       count(*)::BIGINT AS n_orders,
       round(sum(o_totalprice), 6) AS revenue
FROM orders GROUP BY 1 ORDER BY 1""",
    "events_rolling_time": """
SELECT event_id, user_id,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW),
             6) AS range_mean
FROM events ORDER BY event_id""",
    "events_type_share": """
SELECT event_type, count(*)::BIGINT AS n_events,
       round(count(*) / sum(count(*)) OVER (), 6) AS share_n,
       round(sum(value) / sum(sum(value)) OVER (), 6) AS share_value
FROM events GROUP BY event_type ORDER BY event_type""",
    "events_quantiles_by_type_cont": (
        "SELECT event_type, q, value FROM ("
        + " UNION ALL ".join(
            f"SELECT event_type, CAST({q} AS DOUBLE) AS q,"
            f" round(quantile_cont(value, {q}), 6) AS value"
            " FROM events GROUP BY event_type"
            for q in [0.1, 0.5, 0.9])
        + ") ORDER BY event_type, q"),
    "part_brand_stats": """
SELECT p_brand, count(*)::BIGINT AS n_parts,
       count(DISTINCT p_type) AS n_types,
       round(sum(p_retailprice), 6) AS retail_sum,
       max(p_size)::BIGINT AS max_size
FROM part GROUP BY p_brand ORDER BY p_brand""",
}

# The driver's correctness harness runs the FIRST 50 entries of
# this dict.  Round-5 rotation (VERDICT_r04 ask #1): the 8 queries that
# had never received a driver CORRECTNESS row (events_lag, docs_rollup,
# quality_gate, events_rolling, curated_corpus, tpch_*) now sit inside
# the 50-query window; 8 long-stable triple-green queries (media_wav,
# events_by_type, fingerprint, token_stats, docs_sample,
# lang_distribution, events_json, winnow_fingerprint) rotate to the
# tail.  All 58 stay covered by tools/check_oracle.py locally.
QUERIES = {
    "bm25_topk": bm25_topk,
    "merge_bm25": merge_bm25,
    "doc_lengths": doc_lengths,
    "corpus_stats": corpus_stats,
    "term_df": term_df,
    "top_terms": top_terms,
    "dedup_exact": dedup_exact,
    "quality_score": quality_score,
    "lang_id": lang_id_pred,
    "dedup_minhash": dedup_minhash,
    "dedup_simhash": dedup_simhash,
    "knn_cosine": knn_cosine,
    "knn_ivf": knn_ivf_q,             # rows-only (approximate; recall pytest)
    "media_features": media_features,
    "ngram_jaccard": ngram_jaccard,
    "dedup_embedding": dedup_embedding,
    "quality_topk_per_lang": quality_topk_per_lang,
    "events_hourly": events_hourly,
    "events_sessionize": events_sessionize,
    "transcripts_bm25": transcripts_bm25,
    "decontam": decontam,
    "split_docs": split_docs,
    "repetition": repetition,
    "phrase_match": phrase_match,
    "phrase_match_pos": phrase_match_pos,
    "top_bigrams": top_bigrams_q,
    "pmi_bigrams": pmi_bigrams_q,
    "tfidf_keywords": tfidf_keywords_q,
    "events_quantiles": events_quantiles,
    "events_asof": events_asof,
    "events_hopping": events_hopping,
    "events_quantiles_by_type": events_quantiles_by_type,
    "events_distinct_users": events_distinct_users,
    "events_distinct_pairs": events_distinct_pairs,
    "events_hll": events_hll,
    "events_banded": events_banded,
    "docs_pivot": docs_pivot,
    "docs_stratified": docs_stratified,
    "emb_centroids": emb_centroids,
    "orders_unfulfilled": orders_unfulfilled,
    "customer_orders_left": customer_orders_left,
    "events_cumsum": events_cumsum,
    "events_lag": events_lag,
    "docs_rollup": docs_rollup,
    "quality_gate": quality_gate,
    "events_rolling": events_rolling,
    "curated_corpus": curated_corpus,
    "tpch_pricing": tpch_pricing,
    "tpch_shipping": tpch_shipping,
    "tpch_nation_revenue": tpch_nation_revenue,
    # --- tail: long-stable, driver-green in r02-r04; still run locally ---
    "media_wav": media_wav,
    "events_by_type": events_by_type,
    "events_json": events_json,
    "fingerprint": fingerprint,
    "token_stats": token_stats,
    "docs_sample": docs_sample,
    "lang_distribution": lang_distribution,
    "winnow_fingerprint": winnow_fingerprint,
    "docs_rank": docs_rank,
    "events_ntile": events_ntile,
    "events_lead": events_lead,
    "events_funnel": events_funnel,
    "events_users_intersect": events_users_intersect,
    "events_users_except": events_users_except,
    "events_histogram": events_histogram,
    "heavy_trigrams": heavy_trigrams,
    "docs_cube": docs_cube,
    "events_mode": events_mode,
    "docs_regex": docs_regex,
    "events_corr": events_corr,
    "tpch_top_suppliers": tpch_top_suppliers,
    "docs_entropy": docs_entropy,
    "users_event_seq": users_event_seq,
    "docs_dist_rank": docs_dist_rank,
    "dedup_clusters": dedup_clusters,
    "events_resample": events_resample,
    "docs_weighted_sample": docs_weighted_sample,
    "knn_pq": knn_pq,                 # rows-only (approximate; recall pytest)
    "knn_ivfpq": knn_ivfpq,           # rows-only (approximate; recall pytest)
    "events_first_last": events_first_last,
    "events_full_outer": events_full_outer,
    "events_regr": events_regr,
    "lineitem_unpivot": lineitem_unpivot,
    "emb_dim_stats": emb_dim_stats,
    "events_new_users": events_new_users,
    "events_retention": events_retention,
    "events_pivot_sum": events_pivot_sum,
    "customer_nation_broadcast": customer_nation_broadcast,
    "events_latest": events_latest,
    "events_daily_active": events_daily_active,
    "events_profile": events_profile,
    "events_quantiles_cont": events_quantiles_cont,
    "emb_cov": emb_cov,
    "events_weighted_mean": events_weighted_mean,
    "orders_monthly": orders_monthly,
    "part_brand_stats": part_brand_stats,
    "events_quantiles_by_type_cont": events_quantiles_by_type_cont,
    "events_type_share": events_type_share,
    "events_rolling_time": events_rolling_time,
}
