"""Training-data analysis pipelines over a generic documents corpus
(doc_id:int64, text:string, ...): dedup (exact / MinHash-LSH / SimHash /
n-gram Jaccard), text analysis (quality, language ID, fingerprints).

Every pipeline is a streaming Ray Data composition: vectorized
map_batches for per-doc work, hash-partitioned groupby only where
co-location is semantically required (dedup buckets, LSH bands).  Pair
verification uses filtered parquet reads on the (small) candidate set —
a broadcast-style lookup, never an all-to-all join on the corpus.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pyarrow as pa

import ray
import ray.data

from web_search_engine_ray.functions import textproc as tp

# --- text analysis -------------------------------------------------------


def doc_tokens_batch(batch: pa.Table) -> pa.Table:
    from web_search_engine_ray.functions.tokenize import doc_lengths
    dl = doc_lengths(batch.column("text").to_pylist())
    return pa.table({"doc_id": batch.column("doc_id"),
                     "n_tokens": pa.array(dl, pa.int64())})


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    fps = [tp.text_md5(t.lower()) for t in batch.column("text").to_pylist()]
    return pa.table({"doc_id": batch.column("doc_id"),
                     "fingerprint": pa.array(fps, pa.string())})


def quality_batch(batch: pa.Table) -> pa.Table:
    rows = [tp.quality_features(t) for t in batch.column("text").to_pylist()]
    nt, nc, sr, pr, mt = zip(*rows) if rows else ([],) * 5
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pa.array(nt, pa.int64()),
        "n_chars": pa.array(nc, pa.int64()),
        "stopword_ratio": pa.array([round(x, 6) for x in sr], pa.float64()),
        "punct_ratio": pa.array([round(x, 6) for x in pr], pa.float64()),
        "mean_token_len": pa.array([round(x, 6) for x in mt], pa.float64()),
    })


def lang_id_batch(batch: pa.Table) -> pa.Table:
    preds = [tp.lang_id(t) for t in batch.column("text").to_pylist()]
    langs = [p[0] for p in preds]
    confs = [round(p[1], 6) for p in preds]
    return pa.table({"doc_id": batch.column("doc_id"),
                     "pred_lang": pa.array(langs, pa.string()),
                     "confidence": pa.array(confs, pa.float64())})


_WS_RE = None
_SUBWORD_RE = None


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """Token counting: whitespace tokens, pinned regex tokens, BPE-ish
    subword pieces (runs of <=4 alnum chars — a deterministic stand-in
    for a learned-merge tokenizer's piece count), distinct terms.
    Regexes compiled once per worker process (module-level cache);
    re.ASCII pins \\S to RE2/DuckDB semantics."""
    import re

    from web_search_engine_ray.spec import TOKEN_RE
    global _WS_RE, _SUBWORD_RE
    if _WS_RE is None:
        _WS_RE = re.compile(r"\S+", re.ASCII)
        _SUBWORD_RE = re.compile(r"[a-z0-9]{1,4}")
    n_ws, n_tok, n_sub, n_uniq = [], [], [], []
    for t in batch.column("text").to_pylist():
        low = t.lower()
        toks = TOKEN_RE.findall(low)
        n_ws.append(len(_WS_RE.findall(t)))
        n_tok.append(len(toks))
        n_sub.append(len(_SUBWORD_RE.findall(low)))
        n_uniq.append(len(set(toks)))
    return pa.table({"doc_id": batch.column("doc_id"),
                     "n_ws_tokens": pa.array(n_ws, pa.int64()),
                     "n_tokens": pa.array(n_tok, pa.int64()),
                     "n_subwords": pa.array(n_sub, pa.int64()),
                     "n_unique_terms": pa.array(n_uniq, pa.int64())})


def winnow_batch(batch: pa.Table, k: int = 3, w: int = 4) -> pa.Table:
    """Winnowing document fingerprints (Schleimer et al.'s rolling-
    window scheme): md5 each k-word shingle IN POSITION ORDER, slide a
    w-window over the hash sequence, keep each window's minimum;
    fingerprint = the distinct selected hashes.  Emitted exploded as
    (doc_id, fp_hash) rows — SQL-comparable and join-friendly.  Docs
    with fewer than k+w-1 tokens have no complete window and emit no
    rows (oracle parity)."""
    import hashlib as _hl

    import pandas as pd
    from numpy.lib.stride_tricks import sliding_window_view

    from web_search_engine_ray.spec import tokenize
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "fp_hash": pa.array([], pa.string())})
    doc_ids = batch.column("doc_id").to_pylist()
    sh_all: list[str] = []
    runs: list[tuple[int, int]] = []          # (doc position, n_shingles)
    for pos, text in enumerate(batch.column("text").to_pylist()):
        toks = tokenize(text)
        n_sh = len(toks) - k + 1
        if n_sh < w:
            continue
        sh_all.extend(" ".join(toks[i:i + k]) for i in range(n_sh))
        runs.append((pos, n_sh))
    if not sh_all:
        return empty
    # one md5 per DISTINCT shingle in the batch (not per occurrence),
    # then rank-encode: hexdigest lexicographic order == 128-bit numeric
    # order, so window minima over int64 ranks are exact
    codes, uniques = pd.factorize(np.asarray(sh_all, dtype=object))
    digests = np.array([_hl.md5(u.encode()).hexdigest() for u in uniques],
                       dtype=object)
    order = np.argsort(digests)
    rank_of = np.empty(len(order), np.int64)
    rank_of[order] = np.arange(len(order), dtype=np.int64)
    ranks = rank_of[codes]
    hex_by_rank = digests[order]
    ids_out, fp_out = [], []
    off = 0
    for pos, n_sh in runs:
        sel = np.unique(
            sliding_window_view(ranks[off:off + n_sh], w).min(axis=1))
        off += n_sh
        ids_out.append(np.full(len(sel), doc_ids[pos], np.int64))
        fp_out.append(hex_by_rank[sel])
    return pa.table({"doc_id": pa.array(np.concatenate(ids_out), pa.int64()),
                     "fp_hash": pa.array(np.concatenate(fp_out),
                                         pa.string())})


# --- exact dedup (D1 generalized: by content) ----------------------------


def exact_dedup(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Keep min doc_id per distinct text; returns (doc_id, n_copies).

    Shuffle key is the md5 digest -> uniformly balanced groupby even if
    one text is duplicated a billion times the group stays one row per
    partial... (each group holds copies of ONE text; salting not needed
    because group payload is (doc_id) only, reduced via min/count).
    """
    from ray.data.aggregate import Count, Min

    def _h(batch: pa.Table) -> pa.Table:
        fps = [tp.text_md5(t) for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "fp": pa.array(fps, pa.string())})

    hashed = docs.select_columns(["doc_id", "text"]).map_batches(
        _h, batch_format="pyarrow", zero_copy_batch=True)
    agg = hashed.groupby("fp").aggregate(Min("doc_id"), Count())
    return agg.map_batches(
        lambda b: pa.table({
            "doc_id": b.column("min(doc_id)"),
            "n_copies": b.column("count()")}),
        batch_format="pyarrow")


# --- MinHash + LSH near-dedup -------------------------------------------

N_PERM = 128
N_BANDS = 32        # 128/32 = 4 rows/band: P(miss | j=0.8) = (1-.8^4)^32 ≈ 5e-8
SHINGLE_K = 3


class MinHashStage:
    """doc -> (band_id, band_key, doc_id) LSH rows, vectorized: one
    (n_perm × shingles) broadcast multiply + segment-min per doc chunk
    instead of a per-doc Python loop.  Run in task form with a
    per-worker singleton (``minhash_band_batch``) — the autoscaling
    actor pool ramps too slowly for a seconds-long stage.

    Docs with NO shingles are skipped: they can never verify above any
    threshold (the oracle emits no shingle rows for them), and banding
    them would put every empty doc into one giant shared bucket.
    """

    _CHUNK_SHINGLES = 65536       # bounds the (n_perm × T) matrix ~64 MB

    def __init__(self, n_perm: int = N_PERM, n_bands: int = N_BANDS,
                 k: int = SHINGLE_K):
        self.hasher = tp.FastMinHasher(n_perm)
        self.n_perm = n_perm
        self.n_bands = n_bands
        self.k = k

    def _signatures(self, sh_list: list[np.ndarray]) -> np.ndarray:
        """(n_docs, n_perm) signature matrix; empty docs all-FF."""
        n = len(sh_list)
        sigs = np.full((n, self.n_perm), np.uint64(0xFFFFFFFFFFFFFFFF),
                       dtype=np.uint64)
        lens = np.fromiter((len(s) for s in sh_list), np.int64, n)
        idx = np.flatnonzero(lens > 0)
        a = self.hasher.a[:, None]
        b = self.hasher.b[:, None]
        pos = 0
        while pos < len(idx):
            take, tot = [], 0
            while pos < len(idx) and (not take
                                      or tot + lens[idx[pos]] <= self._CHUNK_SHINGLES):
                take.append(idx[pos])
                tot += lens[idx[pos]]
                pos += 1
            X = np.concatenate([sh_list[i] for i in take])
            starts = np.concatenate(
                ([0], np.cumsum(lens[take])[:-1])).astype(np.int64)
            with np.errstate(over="ignore"):
                M = a * X[None, :] + b                      # (P, T)
            sigs[take] = np.minimum.reduceat(M, starts, axis=1).T
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        sh_list = [tp.shingle_hashes(t, self.k) for t in texts]
        keep = np.fromiter((len(s) > 0 for s in sh_list), bool, len(sh_list))
        docs = docs[keep]
        sigs = self._signatures([s for s, m in zip(sh_list, keep) if m])
        rows = self.n_perm // self.n_bands
        n = len(docs)
        band_ids = np.repeat(np.arange(self.n_bands, dtype=np.int32), n)
        doc_out = np.tile(docs, self.n_bands)
        # fold each band's `rows` uint64 lanes into one int64 key with a
        # vectorized FNV-1a-style xor-multiply — no per-row md5 hex
        # strings; a (astronomically rare) fold collision only adds a
        # candidate pair the exact-verify stage then rejects
        seg = sigs.reshape(n, self.n_bands, rows) if n else \
            np.empty((0, self.n_bands, rows), np.uint64)
        key = np.full((n, self.n_bands), np.uint64(0xCBF29CE484222325),
                      dtype=np.uint64)
        with np.errstate(over="ignore"):
            for r in range(rows):
                key = (key ^ seg[:, :, r]) * np.uint64(0x100000001B3)
        keys = key.T.reshape(-1).view(np.int64)     # band-major order
        return pa.table({"doc_id": pa.array(doc_out, pa.int64()),
                         "band_id": pa.array(band_ids, pa.int32()),
                         "band_key": pa.array(keys, pa.int64())})


_MINHASH_WORKER_CACHE: dict = {}


def minhash_band_batch(batch: pa.Table, *, n_perm: int = N_PERM,
                       n_bands: int = N_BANDS, k: int = SHINGLE_K) -> pa.Table:
    """Task-form wrapper with a per-worker-process MinHashStage singleton
    (same pattern as PartitionIndexer.task_fn)."""
    key = (n_perm, n_bands, k)
    inst = _MINHASH_WORKER_CACHE.get(key)
    if inst is None:
        _MINHASH_WORKER_CACHE.clear()
        inst = _MINHASH_WORKER_CACHE[key] = MinHashStage(n_perm, n_bands, k)
    return inst(batch)


from web_search_engine_ray.functions.grouping import (  # noqa: E402
    group_slices as _group_slices, hash_partition as _hash_partition)


def _bucket_pairs(batch: pa.Table) -> pa.Table:
    """All candidate pairs within each complete LSH bucket in this
    hash-partitioned block — NO silent cap (exact duplicates are
    collapsed to one representative BEFORE the LSH pass, so bucket size
    is bounded by true near-dup cluster size, not duplication factor).
    Vectorized: sort once, slice buckets, np.triu_indices per bucket."""
    import pyarrow.compute as pc
    empty = pa.table({"doc_id_a": pa.array([], pa.int64()),
                      "doc_id_b": pa.array([], pa.int64())})
    if batch.num_rows == 0:
        return empty
    idx = pc.sort_indices(batch, sort_keys=[
        ("band_id", "ascending"), ("band_key", "ascending"),
        ("doc_id", "ascending")])
    t = batch.take(idx)
    bid = t.column("band_id").to_numpy()
    bkey = t.column("band_key").to_numpy()
    docs = t.column("doc_id").to_numpy()
    starts, ends = _group_slices([bid, bkey])
    a_out, b_out = [], []
    for s, e in zip(starts, ends):
        if e - s >= 2:
            ids = docs[s:e]
            iu, ju = np.triu_indices(len(ids), k=1)
            a_out.append(ids[iu])
            b_out.append(ids[ju])
    if not a_out:
        return empty
    return pa.table({"doc_id_a": pa.array(np.concatenate(a_out), pa.int64()),
                     "doc_id_b": pa.array(np.concatenate(b_out), pa.int64())})


def minhash_candidates(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """doc -> minhash signature -> LSH banding -> candidate pairs.
    Pairs may repeat across bands (up to n_bands copies); callers dedupe
    the (small) candidate set — cheaper than a distinct shuffle here."""
    bands = docs.select_columns(["doc_id", "text"]).map_batches(
        minhash_band_batch, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=1024)
    return _hash_partition(bands, ["band_id", "band_key"]).map_batches(
        _bucket_pairs, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True)


def _collapse_fp_partition(batch: pa.Table) -> pa.Table:
    """Complete md5-fingerprint groups -> one row per distinct text:
    (rep = min doc_id, members sorted, text).  Vectorized via sorted
    run boundaries + ListArray.from_arrays."""
    if batch.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "members": pa.array([], pa.list_(pa.int64())),
                         "text": pa.array([], pa.string())})
    import pyarrow.compute as pc
    idx = pc.sort_indices(batch, sort_keys=[("fp", "ascending"),
                                            ("doc_id", "ascending")])
    t = batch.take(idx)
    fp = np.asarray(t.column("fp").to_pylist(), dtype=object)
    docs = t.column("doc_id").to_numpy()
    starts, _ends = _group_slices([fp])
    offsets = np.r_[starts, len(docs)].astype(np.int64)
    members = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                       pa.array(docs, pa.int64()))
    return pa.table({"doc_id": pa.array(docs[starts], pa.int64()),
                     "members": members,
                     "text": t.column("text").take(
                         pa.array(starts, pa.int64()))})


def _dup_groups_ds(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Exact-duplicate groups as a MATERIALIZED Dataset: one row per
    distinct text — (rep = min doc_id, members sorted, text).  Hash-
    partitioned on the md5 digest; each partition holds complete
    fingerprint groups.  Materialized so the banding pass (texts, stays
    distributed) and the member expansion (ids only, tiny) consume the
    same blocks without re-execution."""

    def _h(batch: pa.Table) -> pa.Table:
        fps = [tp.text_md5(t) for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "text": batch.column("text"),
                         "fp": pa.array(fps, pa.string())})

    hashed = docs.select_columns(["doc_id", "text"]).map_batches(
        _h, batch_format="pyarrow", zero_copy_batch=True)
    return _hash_partition(hashed, ["fp"]).map_batches(
        _collapse_fp_partition, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True).materialize()


def _rename_batch(mapping: dict[str, str]):
    def fn(batch: pa.Table) -> pa.Table:
        return batch.select(list(mapping)).rename_columns(
            list(mapping.values()))
    return fn


def _join_partitions() -> int:
    n = max(1, int(ray.cluster_resources().get("CPU", 4)))
    return max(2, n // 8)


def near_dup_pairs(docs: "ray.data.Dataset", docs_path: str,
                   threshold: float = 0.8,
                   k: int = SHINGLE_K) -> pa.Table:
    """ALL pairs (a < b) with exact string-shingle Jaccard >= threshold,
    found via exact-dup collapse + MinHash-LSH + exact verification.

    Stages — every one distributed, no corpus-growing driver state:
    (1) collapse exact duplicates (md5 groupby) to one representative
    each; (2) LSH-band the representatives and pair within buckets;
    (3) fetch both candidate texts by HASH JOIN on rep doc_id and verify
    with EXACT string-shingle Jaccard (the same set the DuckDB oracle
    computes) inside map_batches; (4) expand verified rep pairs across
    their dup groups via joins on the members table, and emit
    within-group pairs (jaccard 1.0) straight off the groups Dataset.
    Only OUTPUT-sized tables (pair ids + jaccard) and the final result
    ever reach the driver — texts stay in the object store.
    """
    empty = pa.table({"doc_id_a": pa.array([], pa.int64()),
                      "doc_id_b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
    groups_ds = _dup_groups_ds(docs)
    if groups_ds.count() == 0:
        return empty
    npart = _join_partitions()
    reps_ds = groups_ds.select_columns(["doc_id", "text"])

    # (2) candidates among representatives; dedupe the <= n_bands copies
    # per pair with a hash partition on the pair key (complete groups
    # per block) + per-block np.unique — no driver collection
    def _dedupe_pairs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        arr = np.stack([batch.column("doc_id_a").to_numpy(),
                        batch.column("doc_id_b").to_numpy()], axis=1)
        u = np.unique(arr, axis=0)
        return pa.table({"doc_id_a": pa.array(u[:, 0], pa.int64()),
                         "doc_id_b": pa.array(u[:, 1], pa.int64())})

    cand = _hash_partition(minhash_candidates(reps_ds),
                           ["doc_id_a", "doc_id_b"]).map_batches(
        _dedupe_pairs, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True).materialize()

    if cand.count() > 0:
        # (3) texts arrive via two hash joins on the rep doc_id — the
        # 100 TB-safe replacement for a driver-collected text dict
        reps_a = reps_ds.map_batches(
            _rename_batch({"doc_id": "doc_id_a", "text": "text_a"}),
            batch_format="pyarrow", zero_copy_batch=True)
        reps_b = reps_ds.map_batches(
            _rename_batch({"doc_id": "doc_id_b", "text": "text_b"}),
            batch_format="pyarrow", zero_copy_batch=True)
        with_texts = cand.join(reps_a, "inner", num_partitions=npart,
                               on=("doc_id_a",)) \
            .join(reps_b, "inner", num_partitions=npart, on=("doc_id_b",))

        def verify(batch: pa.Table) -> pa.Table:
            sh_cache: dict[int, set] = {}

            def sh(d: int, text: str) -> set:
                s = sh_cache.get(d)
                if s is None:
                    s = sh_cache[d] = tp.string_shingle_set(text, k)
                return s

            a_out, b_out, j_out = [], [], []
            for a, b, ta, tb in zip(batch.column("doc_id_a").to_pylist(),
                                    batch.column("doc_id_b").to_pylist(),
                                    batch.column("text_a").to_pylist(),
                                    batch.column("text_b").to_pylist()):
                j = tp.string_jaccard(sh(a, ta), sh(b, tb))
                if j >= threshold:
                    a_out.append(a)
                    b_out.append(b)
                    j_out.append(round(j, 6))
            return pa.table({"doc_id_a": pa.array(a_out, pa.int64()),
                             "doc_id_b": pa.array(b_out, pa.int64()),
                             "jaccard": pa.array(j_out, pa.float64())})

        verified_ds = with_texts.map_batches(
            verify, batch_format="pyarrow").materialize()
        if verified_ds.count() == 0:
            # every candidate rejected by the exact verify — joining an
            # empty left side would feed Acero a schema-less table
            verified_ds = None

        # (4a) cross-group expansion: the membership table in EXPLODED
        # relational form (rep, member) — list columns can't ride
        # through an Acero join — then two joins produce every
        # (member_a, member_b) combination of each verified rep pair
        def _explode(rep_col: str, member_col: str):
            def fn(batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc
                mem = batch.column("members")
                if isinstance(mem, pa.ChunkedArray):
                    mem = mem.combine_chunks()
                counts = pc.list_value_length(mem).to_numpy()
                reps = np.repeat(batch.column("doc_id").to_numpy(), counts)
                return pa.table({rep_col: pa.array(reps, pa.int64()),
                                 member_col: mem.flatten()})
            return fn

        if verified_ds is not None:
            mem_a = groups_ds.map_batches(
                _explode("doc_id_a", "member_a"), batch_format="pyarrow",
                zero_copy_batch=True)
            mem_b = groups_ds.map_batches(
                _explode("doc_id_b", "member_b"), batch_format="pyarrow",
                zero_copy_batch=True)
            vm = verified_ds.join(mem_a, "inner", num_partitions=npart,
                                  on=("doc_id_a",)) \
                .join(mem_b, "inner", num_partitions=npart,
                      on=("doc_id_b",))

            def expand(batch: pa.Table) -> pa.Table:
                a = batch.column("member_a").to_numpy()
                b = batch.column("member_b").to_numpy()
                return pa.table({
                    "doc_id_a": pa.array(np.minimum(a, b), pa.int64()),
                    "doc_id_b": pa.array(np.maximum(a, b), pa.int64()),
                    "jaccard": batch.column("jaccard")})

            cross_batches = [b for b in vm.map_batches(
                expand, batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow") if b.num_rows]
            verified_tbl = pa.concat_tables(cross_batches) \
                if cross_batches else None
        else:
            verified_tbl = None
    else:
        verified_tbl = None

    # (4b) within-group pairs: identical texts => jaccard 1.0, but only
    # when the text actually has shingles (docs with < k tokens emit no
    # shingle rows in the oracle and therefore no pairs)
    def within(batch: pa.Table) -> pa.Table:
        a_out, b_out = [], []
        for members, text in zip(batch.column("members").to_pylist(),
                                 batch.column("text").to_pylist()):
            if len(members) > 1 and tp.string_shingle_set(text, k):
                m = np.sort(np.asarray(members, np.int64))
                iu, ju = np.triu_indices(len(m), k=1)
                a_out.append(m[iu])
                b_out.append(m[ju])
        if not a_out:
            return pa.table({"doc_id_a": pa.array([], pa.int64()),
                             "doc_id_b": pa.array([], pa.int64()),
                             "jaccard": pa.array([], pa.float64())})
        a = np.concatenate(a_out)
        return pa.table({"doc_id_a": pa.array(a, pa.int64()),
                         "doc_id_b": pa.array(np.concatenate(b_out),
                                              pa.int64()),
                         "jaccard": pa.array(np.ones(len(a)), pa.float64())})

    within_batches = [b for b in groups_ds.map_batches(
        within, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow") if b.num_rows]
    parts = ([verified_tbl] if verified_tbl is not None else []) \
        + within_batches
    if not parts:
        return empty
    out = pa.concat_tables(parts)
    return out.sort_by([("doc_id_a", "ascending"),
                        ("doc_id_b", "ascending")])


# --- exact n-gram Jaccard (small-scale oracle-checkable variant) ---------


def ngram_jaccard_pairs(docs: "ray.data.Dataset", k: int = 3,
                        threshold: float = 0.5) -> pa.Table:
    """Exact all-pairs word-shingle Jaccard over a SMALL corpus.

    Shingle sets are computed distributed (map_batches over string
    shingles — strings, not crc hashes, for exact DuckDB-oracle parity);
    the pairwise step is driver-side over the collected per-doc sets.
    The scalable variant of this operation is near_dup_pairs (MinHash
    LSH candidates + exact verification) — this function is the
    exhaustive cross-check the oracle can also express.
    """
    from web_search_engine_ray.spec import tokenize

    def shingle_sets(batch: pa.Table) -> pa.Table:
        ids, sets = [], []
        for d, text in zip(batch.column("doc_id").to_pylist(),
                           batch.column("text").to_pylist()):
            toks = tokenize(text)
            sh = sorted({" ".join(toks[i:i + k])
                         for i in range(len(toks) - k + 1)}) \
                if len(toks) >= k else []
            ids.append(d)
            sets.append(sh)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "shingles": pa.array(sets, pa.list_(pa.string()))})

    collected = pa.concat_tables(list(
        docs.select_columns(["doc_id", "text"])
        .map_batches(shingle_sets, batch_format="pyarrow",
                     zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow")))
    ids = collected.column("doc_id").to_pylist()
    sets = [set(s) for s in collected.column("shingles").to_pylist()]
    order = np.argsort(ids)
    a_out, b_out, j_out = [], [], []
    for ii in range(len(order)):
        i = order[ii]
        if not sets[i]:
            continue
        for jj in range(ii + 1, len(order)):
            j = order[jj]
            if not sets[j]:
                continue
            inter = len(sets[i] & sets[j])
            if inter == 0:
                continue
            jac = inter / (len(sets[i]) + len(sets[j]) - inter)
            if jac >= threshold:
                a_out.append(ids[i])
                b_out.append(ids[j])
                j_out.append(round(jac, 6))
    return pa.table({"doc_id_a": pa.array(a_out, pa.int64()),
                     "doc_id_b": pa.array(b_out, pa.int64()),
                     "jaccard": pa.array(j_out, pa.float64())})


# --- embedding-cosine near-dedup -----------------------------------------


def _chunk_pair_table(refs_ref, i: int, j: int,
                      threshold: float) -> pa.Table:
    """Qualifying (a < b) cosine pairs between chunk i and chunk j."""
    from web_search_engine_ray.pipelines.knn import _batch_matrix, _normalize
    refs = ray.get(refs_ref)
    ta = ray.get(refs[i])
    ids_a = ta.column("vec_id").to_numpy()
    A = _normalize(_batch_matrix(ta))
    if i == j:
        sims = A @ A.T
        iu, ju = np.triu_indices(len(ids_a), k=1)
        keep = sims[iu, ju] >= threshold
        a, b = ids_a[iu[keep]], ids_a[ju[keep]]
        s = sims[iu[keep], ju[keep]]
    else:
        tb = ray.get(refs[j])
        ids_b = tb.column("vec_id").to_numpy()
        B = _normalize(_batch_matrix(tb))
        sims = A @ B.T
        r, c = np.nonzero(sims >= threshold)
        a, b = ids_a[r], ids_b[c]
        s = sims[r, c]
        flip = a > b
        a, b = np.where(flip, b, a), np.where(flip, a, b)
    return pa.table({"vec_id_a": pa.array(a.astype(np.int64)),
                     "vec_id_b": pa.array(b.astype(np.int64)),
                     "sim": pa.array(np.round(s, 6), pa.float64())})


def embedding_dup_pairs(embeddings: "ray.data.Dataset",
                        threshold: float = 0.45,
                        chunk_rows: int = 2048) -> pa.Table:
    """EXACT all pairs of vectors with cosine >= threshold, as a
    distributed BLOCK-PAIR matmul.

    The corpus is chunked into object-store blocks; a Dataset of chunk
    index pairs (i <= j) drives one matmul task per pair.  Work is the
    inherent O(N^2) of an exact threshold join, but split across
    P(P+1)/2 independent tasks with O(2·chunk) memory each — no
    full-matrix broadcast anywhere (each task reads exactly its two
    chunks from the object store).  For the 100 TB APPROXIMATE path use
    embedding_dup_pairs_ann (IVF-bucketed, same output schema).
    """
    mat = embeddings.select_columns(["vec_id", "embedding"]) \
        .materialize()
    n_rows = mat.count()
    empty = pa.table({"vec_id_a": pa.array([], pa.int64()),
                      "vec_id_b": pa.array([], pa.int64()),
                      "sim": pa.array([], pa.float64())})
    if n_rows == 0:
        return empty
    n_chunks = max(1, -(-n_rows // chunk_rows))
    if n_chunks != mat.num_blocks():
        mat = mat.repartition(num_blocks=n_chunks).materialize()
    refs = mat.to_arrow_refs()
    refs_ref = ray.put(refs)
    n = len(refs)
    pairs_idx = pa.table({
        "i": pa.array([i for i in range(n) for _ in range(i, n)], pa.int32()),
        "j": pa.array([j for i in range(n) for j in range(i, n)], pa.int32())})

    def pair_batch(batch: pa.Table) -> pa.Table:
        outs = [_chunk_pair_table(refs_ref, int(i), int(j), threshold)
                for i, j in zip(batch.column("i").to_pylist(),
                                batch.column("j").to_pylist())]
        return pa.concat_tables(outs)

    out_batches = [b for b in ray.data.from_arrow(pairs_idx)
                   .repartition(num_blocks=min(len(refs) * (len(refs) + 1) // 2,
                                               64))
                   .map_batches(pair_batch, batch_format="pyarrow",
                                batch_size=None)
                   .iter_batches(batch_format="pyarrow") if b.num_rows]
    if not out_batches:
        return empty
    return pa.concat_tables(out_batches) \
        .sort_by([("vec_id_a", "ascending"), ("vec_id_b", "ascending")])


def embedding_dup_pairs_ann(embeddings: "ray.data.Dataset",
                            threshold: float = 0.45,
                            n_centroids: int = 16,
                            nprobe: int = 2) -> pa.Table:
    """APPROXIMATE near-dup pairs: IVF multi-assignment bucketing.

    Each vector is assigned to its nprobe nearest k-means centroids;
    pairs are only compared inside shared buckets (hash-partitioned
    groupby on centroid_id) — O(N^2 / n_centroids · nprobe^2) expected
    work and no broadcast of corpus-sized state.  Recall is tested
    against the exact path (tests/test_analysis.py); high-cosine pairs
    almost always share a nearest centroid.
    """
    from web_search_engine_ray.pipelines.knn import (_batch_matrix,
                                                     _normalize,
                                                     ivf_centroids)
    cents = ivf_centroids(embeddings, n_centroids)
    cent_ref = ray.put(cents)

    def assign_multi(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        ids = batch.column("vec_id").to_numpy()
        m = _normalize(_batch_matrix(batch))
        top = np.argsort(-(m @ c.T), axis=1)[:, :nprobe].astype(np.int32)
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        out_ids = np.repeat(ids, nprobe)
        out_cid = top.reshape(-1)
        rep_idx = pa.array(np.repeat(np.arange(len(ids)), nprobe))
        return pa.table({"vec_id": pa.array(out_ids, pa.int64()),
                         "centroid_id": pa.array(out_cid, pa.int32()),
                         "embedding": emb.take(rep_idx)})

    assigned = embeddings.select_columns(["vec_id", "embedding"]) \
        .map_batches(assign_multi, batch_format="pyarrow",
                     zero_copy_batch=True)

    def bucket_pairs(batch: pa.Table) -> pa.Table:
        """Complete centroid buckets per hash partition; exact cosine
        within each bucket."""
        import pyarrow.compute as pc
        empty = pa.table({"vec_id_a": pa.array([], pa.int64()),
                          "vec_id_b": pa.array([], pa.int64()),
                          "sim": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        idx = pc.sort_indices(batch, sort_keys=[
            ("centroid_id", "ascending"), ("vec_id", "ascending")])
        t = batch.take(idx)
        cid = t.column("centroid_id").to_numpy()
        ids = t.column("vec_id").to_numpy()
        M = _normalize(_batch_matrix(t))
        starts, ends = _group_slices([cid])
        a_out, b_out, s_out = [], [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            sub = M[s:e]
            sims = sub @ sub.T
            iu, ju = np.triu_indices(e - s, k=1)
            keep = (sims[iu, ju] >= threshold) & \
                (ids[s:e][iu] != ids[s:e][ju])
            a_out.append(ids[s:e][iu[keep]])
            b_out.append(ids[s:e][ju[keep]])
            s_out.append(sims[iu[keep], ju[keep]])
        if not a_out:
            return empty
        return pa.table({
            "vec_id_a": pa.array(np.concatenate(a_out).astype(np.int64)),
            "vec_id_b": pa.array(np.concatenate(b_out).astype(np.int64)),
            "sim": pa.array(np.round(np.concatenate(s_out), 6),
                            pa.float64())})

    raw = [b for b in _hash_partition(assigned, ["centroid_id"])
           .map_batches(bucket_pairs, batch_size=None,
                        batch_format="pyarrow", zero_copy_batch=True)
           .iter_batches(batch_format="pyarrow") if b.num_rows]
    if not raw:
        return pa.table({"vec_id_a": pa.array([], pa.int64()),
                         "vec_id_b": pa.array([], pa.int64()),
                         "sim": pa.array([], pa.float64())})
    tbl = pa.concat_tables(raw)
    # dedupe pairs found in several shared buckets (sim identical)
    arr = np.stack([tbl.column("vec_id_a").to_numpy(),
                    tbl.column("vec_id_b").to_numpy()], axis=1)
    _uniq, first = np.unique(arr, axis=0, return_index=True)
    keep = pa.array(np.sort(first))
    return tbl.take(keep).sort_by([("vec_id_a", "ascending"),
                                   ("vec_id_b", "ascending")])


# --- SimHash near-dedup --------------------------------------------------


def simhash_batch(batch: pa.Table) -> pa.Table:
    hs = tp.simhash64_batch(batch.column("text").to_pylist())
    return pa.table({"doc_id": batch.column("doc_id"),
                     "simhash": pa.array(hs.astype(np.int64))})


def simhash_pairs(docs: "ray.data.Dataset", max_hamming: int = 3) -> pa.Table:
    """Near-dup pairs by SimHash: 4×16-bit bands (any doc pair within
    hamming distance ≤3 shares at least one exact band), verified by
    full hamming distance.  Banding is a groupby shuffle; verification
    happens inside each bucket group."""
    sims = docs.select_columns(["doc_id", "text"]).map_batches(
        simhash_batch, batch_format="pyarrow", zero_copy_batch=True)

    def expand(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy()
        h = batch.column("simhash").to_numpy().astype(np.uint64)
        out_d, out_band, out_key, out_h = [], [], [], []
        for b in range(4):
            key = ((h >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            out_d.append(d)
            out_band.append(np.full(len(d), b, dtype=np.int32))
            out_key.append(key)
            out_h.append(h.astype(np.int64))
        return pa.table({"doc_id": np.concatenate(out_d),
                         "band_id": np.concatenate(out_band),
                         "band_key": np.concatenate(out_key),
                         "simhash": np.concatenate(out_h)})

    def bucket_pairs(batch: pa.Table) -> pa.Table:
        """Verified pairs within each complete 16-bit band bucket of this
        hash-partitioned block; hamming via vectorized xor+popcount."""
        import pyarrow.compute as pc
        empty = pa.table({"doc_id_a": pa.array([], pa.int64()),
                          "doc_id_b": pa.array([], pa.int64()),
                          "hamming": pa.array([], pa.int32())})
        if batch.num_rows == 0:
            return empty
        idx = pc.sort_indices(batch, sort_keys=[
            ("band_id", "ascending"), ("band_key", "ascending"),
            ("doc_id", "ascending")])
        t = batch.take(idx)
        bid = t.column("band_id").to_numpy()
        bkey = t.column("band_key").to_numpy()
        docs = t.column("doc_id").to_numpy()
        hs = t.column("simhash").to_numpy().astype(np.uint64)
        starts, ends = _group_slices([bid, bkey])
        a_out, b_out, d_out = [], [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            iu, ju = np.triu_indices(e - s, k=1)
            x = hs[s:e][iu] ^ hs[s:e][ju]
            # popcount: 8 bytes per uint64, table-free via unpackbits
            hd = np.unpackbits(x.view(np.uint8).reshape(len(x), 8),
                               axis=1).sum(axis=1).astype(np.int32)
            keep = hd <= max_hamming
            if keep.any():
                a_out.append(docs[s:e][iu[keep]])
                b_out.append(docs[s:e][ju[keep]])
                d_out.append(hd[keep])
        if not a_out:
            return empty
        return pa.table({
            "doc_id_a": pa.array(np.concatenate(a_out), pa.int64()),
            "doc_id_b": pa.array(np.concatenate(b_out), pa.int64()),
            "hamming": pa.array(np.concatenate(d_out), pa.int32())})

    pairs = _hash_partition(sims.map_batches(expand, batch_format="pyarrow"),
                            ["band_id", "band_key"]).map_batches(
        bucket_pairs, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True)
    batches = [b for b in pairs.iter_batches(batch_format="pyarrow")
               if b.num_rows]
    if not batches:
        return pa.table({"doc_id_a": pa.array([], pa.int64()),
                         "doc_id_b": pa.array([], pa.int64()),
                         "hamming": pa.array([], pa.int32())})
    tbl = pa.concat_tables(batches)
    # a pair can match in several bands with the SAME full-hash hamming:
    # dedupe the (small) verified set driver-side (at larger pair volumes
    # this becomes the groupby("doc_id_a","doc_id_b") it replaces)
    arr = np.stack([tbl.column("doc_id_a").to_numpy(),
                    tbl.column("doc_id_b").to_numpy(),
                    tbl.column("hamming").to_numpy()], axis=1)
    arr = np.unique(arr, axis=0)
    return pa.table({"doc_id_a": pa.array(arr[:, 0], pa.int64()),
                     "doc_id_b": pa.array(arr[:, 1], pa.int64()),
                     "hamming": pa.array(arr[:, 2].astype(np.int32),
                                         pa.int32())})
