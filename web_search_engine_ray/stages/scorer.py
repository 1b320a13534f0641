"""Query-side stages: segment reader, exhaustive BM25, block-max WAND (A3),
and the naive in-memory oracle (A4).

Rank-identity contract (SURVEY.md §0.4, A.5): WAND over compressed
segments must produce the exact top-k doc_id sequence and bit-equal
float64 scores vs exhaustive scoring, because (a) per-doc summation is
always in lexicographic unique-term order, (b) pruning skips only on
STRICT upper-bound inequality (never on equality).
"""

from __future__ import annotations

import glob
import heapq
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from web_search_engine_ray.functions import codec
from web_search_engine_ray.spec import (B, BLOCK_SIZE, K1, idf as idf_fn,
                                        tokenize)
from web_search_engine_ray.state.manifest import read_stats


class Dictionary:
    """Sorted Arrow-native term dictionary: term -> (bucket, df, cf,
    max_tf) via binary search over parallel arrays — no per-row Python
    dict materialization (the round-1 loader zip-looped the whole vocab
    into a dict per process).  Pickles/plasma-shares as four arrays;
    numpy views come back zero-copy.  At extreme vocab (10^12 docs) the
    same structure shards by term range; lookup semantics unchanged."""

    __slots__ = ("terms", "bucket", "df", "cf", "max_tf")

    def __init__(self, tbl: pa.Table):
        t = tbl.sort_by("term") if tbl.num_rows else tbl
        self.terms = np.asarray(t.column("term").to_pylist(), dtype=object)
        self.bucket = t.column("bucket").to_numpy().astype(np.int32) \
            if t.num_rows else np.empty(0, np.int32)
        self.df = t.column("df").to_numpy().astype(np.int64) \
            if t.num_rows else np.empty(0, np.int64)
        self.cf = t.column("cf").to_numpy().astype(np.int64) \
            if t.num_rows else np.empty(0, np.int64)
        self.max_tf = t.column("max_tf").to_numpy().astype(np.int32) \
            if t.num_rows else np.empty(0, np.int32)

    @classmethod
    def load(cls, index_dir: str) -> "Dictionary":
        paths = sorted(glob.glob(os.path.join(index_dir, "dictionary",
                                              "*.parquet")))
        cols = ["term", "bucket", "df", "cf", "max_tf"]
        if not paths:
            return cls(pa.table({"term": pa.array([], pa.string()),
                                 "bucket": pa.array([], pa.int32()),
                                 "df": pa.array([], pa.int64()),
                                 "cf": pa.array([], pa.int64()),
                                 "max_tf": pa.array([], pa.int32())}))
        return cls(pa.concat_tables(
            [pq.read_table(p, columns=cols) for p in paths]))

    def _find(self, term: str) -> int:
        i = int(np.searchsorted(self.terms, term)) if len(self.terms) else 0
        if i < len(self.terms) and self.terms[i] == term:
            return i
        return -1

    def get(self, term: str, default=None):
        i = self._find(term)
        if i < 0:
            return default
        return (int(self.bucket[i]), int(self.df[i]), int(self.cf[i]),
                int(self.max_tf[i]))

    def __contains__(self, term: str) -> bool:
        return self._find(term) >= 0

    def __getitem__(self, term: str):
        v = self.get(term)
        if v is None:
            raise KeyError(term)
        return v

    def __len__(self) -> int:
        return len(self.terms)


SHARDED_DICT_DIRNAME = "dictionary_sharded"


def build_sharded_dictionary(index_dir: str,
                             rows_per_shard: int = 262_144) -> dict:
    """Re-shard the bucket-hashed dictionary into TERM-RANGE shard files
    (``dictionary_sharded/shard-*.parquet``, globally term-sorted, plus
    a ``_manifest.json`` of per-shard [first_term, last_term, n, path]).

    This is the extreme-vocab form Dictionary's docstring promises: a
    reader then loads only the shards its queries touch (O(query terms)
    shards in memory per actor) instead of materializing the whole
    vocab.  Build shape: ONE Ray Data range sort over the dictionary
    rows, order-preserving repartition to ~rows_per_shard blocks, then
    a per-block atomic shard write — block ranges are disjoint by the
    sort's range partitioning, so shard boundaries never overlap."""
    import json
    import math

    src = os.path.join(index_dir, "dictionary")
    out = os.path.join(index_dir, SHARDED_DICT_DIRNAME)
    os.makedirs(out, exist_ok=True)
    import ray
    import ray.data
    ds = ray.data.read_parquet(
        src, columns=["term", "bucket", "df", "cf", "max_tf"])
    total = ds.count()
    n_shards = max(1, math.ceil(total / rows_per_shard))

    def _write_shard(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"first_term": pa.array([], pa.string()),
                             "last_term": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "path": pa.array([], pa.string())})
        import hashlib as _h
        batch = batch.sort_by("term")      # in-block order (range-disjoint)
        first = batch.column("term")[0].as_py()
        last = batch.column("term")[-1].as_py()
        name = f"shard-{_h.sha1(first.encode()).hexdigest()[:12]}.parquet"
        path = os.path.join(out, name)
        tmp = path + f".tmp{os.getpid()}"
        pq.write_table(batch, tmp, compression="zstd")
        os.replace(tmp, path)
        return pa.table({"first_term": pa.array([first], pa.string()),
                         "last_term": pa.array([last], pa.string()),
                         "n": pa.array([batch.num_rows], pa.int64()),
                         "path": pa.array([name], pa.string())})

    rows = (ds.sort("term").repartition(n_shards)
            .map_batches(_write_shard, batch_size=None,
                         batch_format="pyarrow", zero_copy_batch=True)
            .take_all())
    shards = sorted((dict(r) for r in rows if r["n"]),
                    key=lambda r: r["first_term"])
    manifest = {"n_terms": int(sum(r["n"] for r in shards)),
                "shards": shards,
                # pin the index this re-shard was built FROM: a rebuild
                # into the same out_dir changes the stats fingerprint,
                # and readers then fall back to the live dictionary
                # instead of silently planning from stale df/buckets
                "index_fingerprint": index_fingerprint(index_dir)}
    mpath = os.path.join(out, "_manifest.json")
    with open(mpath + ".tmp", "w") as f:
        json.dump(manifest, f)
    os.replace(mpath + ".tmp", mpath)
    return manifest


def index_fingerprint(index_dir: str) -> str:
    """Stable identity of the index currently on disk: sha1 over its
    canonicalized stats JSON (config_hash + corpus counts + BM25
    params).  Cheap (stats is one tiny file) and changes on any rebuild
    that could invalidate derived artifacts like the sharded
    dictionary."""
    import hashlib
    import json
    return hashlib.sha1(json.dumps(
        read_stats(index_dir), sort_keys=True).encode()).hexdigest()


def sharded_dictionary_current(index_dir: str) -> bool:
    """True iff dictionary_sharded/ exists AND was built from the index
    now on disk (manifest fingerprint matches the current stats)."""
    import json
    mpath = os.path.join(index_dir, SHARDED_DICT_DIRNAME, "_manifest.json")
    if not os.path.exists(mpath):
        return False
    try:
        with open(mpath) as f:
            m = json.load(f)
    except (OSError, ValueError):
        return False
    return m.get("index_fingerprint") == index_fingerprint(index_dir)


def load_dictionary(index_dir: str, prefer_sharded: bool = True):
    """The one dictionary-open path: the term-range-sharded form when it
    exists AND matches the live index, else the full Dictionary.  Stale
    sharded copies (rebuild into the same out_dir) are never used."""
    if prefer_sharded and sharded_dictionary_current(index_dir):
        return ShardedDictionary(index_dir)
    return Dictionary.load(index_dir)


class ShardedDictionary:
    """Term-range-sharded dictionary: same lookup surface as
    ``Dictionary`` (get / __contains__ / __getitem__ / __len__, binary
    search by term) but only the shards actually touched are resident —
    a 10^9-term vocab costs each actor O(touched shards), not O(vocab).
    Lookup: binary search the manifest's first_term boundaries, load
    that one shard (bounded LRU-ish cache), binary search inside it."""

    def __init__(self, index_dir: str, max_loaded_shards: int = 16):
        import json
        self._dir = os.path.join(index_dir, SHARDED_DICT_DIRNAME)
        with open(os.path.join(self._dir, "_manifest.json")) as f:
            m = json.load(f)
        self._shards = m["shards"]
        self._n_terms = int(m["n_terms"])
        self._firsts = np.asarray([s["first_term"] for s in self._shards],
                                  dtype=object)
        self._lasts = [s["last_term"] for s in self._shards]
        self._loaded: dict[int, Dictionary] = {}
        self._max_loaded = max_loaded_shards

    def _shard_for(self, term: str) -> int:
        if not len(self._firsts):
            return -1
        i = int(np.searchsorted(self._firsts, term, side="right")) - 1
        if i < 0 or term > self._lasts[i]:
            return -1
        return i

    def _shard(self, i: int) -> Dictionary:
        d = self._loaded.get(i)
        if d is None:
            if len(self._loaded) >= self._max_loaded:
                self._loaded.clear()
            tbl = pq.read_table(
                os.path.join(self._dir, self._shards[i]["path"]))
            d = self._loaded[i] = Dictionary(tbl)
        return d

    def get(self, term: str, default=None):
        i = self._shard_for(term)
        if i < 0:
            return default
        return self._shard(i).get(term, default)

    def __contains__(self, term: str) -> bool:
        return self.get(term) is not None

    def __getitem__(self, term: str):
        v = self.get(term)
        if v is None:
            raise KeyError(term)
        return v

    def __len__(self) -> int:
        return self._n_terms


class IndexReader:
    """Opens an index dir once (per QueryScorer actor): dictionary,
    corpus stats, doc_len array, lazy per-bucket segment tables + an
    in-actor posting cache.  ``dict_mode="sharded"`` swaps the full
    in-memory vocab for the on-demand ShardedDictionary (requires a
    prior build_sharded_dictionary run).  Scale note: at 10^12 docs the
    doc_len array becomes doc-sharded / filtered parquet reads; the
    segment access pattern (columnar row lookup by sorted term) holds.
    """

    def __init__(self, index_dir: str, max_cached_terms: int = 4096,
                 shared: "dict | ray.ObjectRef | None" = None,
                 dict_mode: str = "full"):
        """shared: optional object-store handle from ``share_index`` —
        dictionary / doc_lens / segment tables are then zero-copy plasma
        views instead of per-actor disk reads (broadcast-once pattern:
        on an N-actor pool this saves (N-1)x the index I/O)."""
        import ray as _ray
        self.index_dir = index_dir
        self.stats = read_stats(index_dir)
        self.N = float(self.stats["n_docs"])
        self.avgdl = float(self.stats["avgdl"])
        self.dl_min = float(self.stats["dl_min"])
        self._shared_decoded = {}
        self._shared_broker = None
        if shared is not None:
            shared = _ray.get(shared) if isinstance(shared, _ray.ObjectRef) \
                else shared
            self.dictionary = _ray.get(shared["dictionary"])
            self.doc_lens = _ray.get(shared["doc_lens"])
            self._shared_broker = shared.get("segments_broker")
            segs = shared.get("segments")
            self._shared_segments = dict(segs) if segs is not None else None
            # hot terms pre-decoded ONCE at share time; plasma zero-copy
            self._shared_decoded = dict(shared.get("decoded", {}))
        else:
            self._shared_segments = None
            # sorted Arrow-native dictionary, binary-search lookups;
            # "sharded" keeps only touched term-range shards resident —
            # but a sharded copy left over from a PREVIOUS build of this
            # out_dir is stale metadata: fall back to the live full
            # dictionary when the fingerprint mismatches
            self.dictionary = ShardedDictionary(index_dir) \
                if dict_mode == "sharded" and \
                sharded_dictionary_current(index_dir) \
                else Dictionary.load(index_dir)
            # dense doc_len array from the DL_SENTINEL posting list
            # (first row of its bucket file — '\x00' sorts before any
            # real term)
            from web_search_engine_ray.spec import DL_SENTINEL, term_bucket
            b = term_bucket(DL_SENTINEL, int(self.stats["num_buckets"]))
            n = int(self.stats["max_doc_id"]) + 1
            self.doc_lens = np.zeros(max(n, 1), dtype=np.float64)
            seg_path = os.path.join(index_dir, "segments",
                                    f"bucket={b}.parquet")
            seg = pq.read_table(seg_path) if os.path.exists(seg_path) \
                else pa.table({"term": pa.array([], pa.string())})
            if seg.num_rows and seg.column("term")[0].as_py() == DL_SENTINEL:
                row = seg.slice(0, 1).to_pylist()[0]
                docs, dls = codec.decode_postings(
                    row["doc_bytes"], row["tf_bytes"], row["n"])
                self.doc_lens[docs] = dls.astype(np.float64)
        self._seg_cache: dict[int, pa.Table] = {}
        self._post_cache: dict[str, codec.EncodedPostings] = {}
        self._decoded_cache: dict[str, tuple] = {}
        self._max_cached_terms = max_cached_terms

    def _bucket_table(self, bucket: int) -> pa.Table:
        tbl = self._seg_cache.get(bucket)
        if tbl is None:
            if self._shared_broker is not None:
                import ray as _ray
                # on-demand cluster-wide share: the broker reads + puts
                # each bucket ONCE on first touch (any actor), every
                # later reader gets the memoized plasma ref — footprint
                # bounded by TOUCHED buckets, not index size
                ref = _ray.get(self._shared_broker.bucket_ref.remote(bucket))
                tbl = _ray.get(ref)                            # zero-copy
            elif self._shared_segments is not None:
                import ray as _ray
                tbl = _ray.get(self._shared_segments[bucket])  # zero-copy
            else:
                path = os.path.join(self.index_dir, "segments",
                                    f"bucket={bucket}.parquet")
                tbl = pq.read_table(path)
            if len(self._seg_cache) > 64:
                self._seg_cache.clear()
            self._seg_cache[bucket] = tbl
        return tbl

    def postings(self, term: str) -> codec.EncodedPostings | None:
        if term in self._post_cache:
            return self._post_cache[term]
        entry = self.dictionary.get(term)
        if entry is None:
            return None
        bucket = entry[0]
        tbl = self._bucket_table(bucket)
        terms = tbl.column("term")
        # file rows are sorted by term -> binary search
        lo, hi = 0, tbl.num_rows
        while lo < hi:
            mid = (lo + hi) // 2
            if terms[mid].as_py() < term:
                lo = mid + 1
            else:
                hi = mid
        if lo >= tbl.num_rows or terms[lo].as_py() != term:
            return None
        row = tbl.slice(lo, 1).to_pylist()[0]
        enc = codec.EncodedPostings(
            n=row["n"], first_doc=row["first_doc"], last_doc=row["last_doc"],
            doc_bytes=row["doc_bytes"], tf_bytes=row["tf_bytes"],
            block_last_doc=np.asarray(row["block_last_doc"], dtype=np.int64),
            block_max_tf=np.asarray(row["block_max_tf"], dtype=np.int32),
            block_off_docs=np.asarray(row["block_off_docs"], dtype=np.int64),
            block_off_tfs=np.asarray(row["block_off_tfs"], dtype=np.int64),
            max_tf=row["max_tf"])
        if len(self._post_cache) >= self._max_cached_terms:
            self._post_cache.clear()
        self._post_cache[term] = enc
        return enc

    def decoded(self, term: str):
        """Fully-decoded (doc_ids, tfs) with a small cache — hot terms
        come zero-copy from the share_index plasma pre-decode (decoded
        once per CLUSTER, not once per actor); the rest decode once per
        actor."""
        hit = self._decoded_cache.get(term)
        if hit is not None:
            return hit
        ref = self._shared_decoded.get(term)
        if ref is not None:
            import ray as _ray
            pair = _ray.get(ref)          # zero-copy numpy views
        else:
            enc = self.postings(term)
            if enc is None:
                return None
            pair = codec.decode_postings(enc.doc_bytes, enc.tf_bytes, enc.n)
        if len(self._decoded_cache) >= 256:
            self._decoded_cache.clear()
        self._decoded_cache[term] = pair
        return pair

    def decoded_range(self, term: str, lo: int, hi: int):
        """Decode only the posting blocks intersecting doc range
        [lo, hi) — block-max metadata gives the byte extents, so a
        doc-range shard costs O(its share of postings), never a full
        list decode (the substrate of sharded serving).  Terms that are
        already decoded (share_index pre-decode in plasma, or this
        actor's cache) slice zero-copy instead."""
        enc = self.postings(term)
        if enc is None:
            return None
        if term in self._decoded_cache or term in self._shared_decoded:
            docs, tfs = self.decoded(term)
            a = int(np.searchsorted(docs, lo))
            b = int(np.searchsorted(docs, hi))
            return docs[a:b], tfs[a:b]
        bl = enc.block_last_doc
        nb = len(bl)
        bi = int(np.searchsorted(bl, lo))
        if bi >= nb:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        bj = min(int(np.searchsorted(bl, max(lo, hi - 1))), nb - 1)
        d0 = int(enc.block_off_docs[bi])
        d1 = int(enc.block_off_docs[bj + 1]) if bj + 1 < nb \
            else len(enc.doc_bytes)
        t0 = int(enc.block_off_tfs[bi])
        t1 = int(enc.block_off_tfs[bj + 1]) if bj + 1 < nb \
            else len(enc.tf_bytes)
        deltas = codec.varbyte_decode(enc.doc_bytes[d0:d1]).astype(np.int64)
        base = int(bl[bi - 1]) if bi > 0 else 0
        docs = base + np.cumsum(deltas)
        tfs = codec.varbyte_decode(enc.tf_bytes[t0:t1]).astype(np.int64)
        a = int(np.searchsorted(docs, lo))
        b = int(np.searchsorted(docs, hi))
        return docs[a:b], tfs[a:b]

    def idf(self, term: str) -> float:
        entry = self.dictionary.get(term)
        if entry is None:
            return 0.0
        return idf_fn(self.N, float(entry[1]))


def _bm25_vec(tfs: np.ndarray, dls: np.ndarray, avgdl: float, idf_t: float) -> np.ndarray:
    tf = tfs.astype(np.float64)
    return idf_t * tf / (tf + K1 * (1.0 - B + B * dls / avgdl))


def _topk_from_arrays(doc_ids: np.ndarray, scores: np.ndarray, k: int):
    """k best by (-score, doc_id); doc_ids ascending-unique on input."""
    n = len(doc_ids)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    if n > 4 * k:
        # O(n) selection first; ties at the kth score all survive to the
        # exact lexsort below, so tie-break semantics are unchanged
        kth = np.partition(scores, n - k)[n - k]
        mask = scores >= kth
        doc_ids, scores = doc_ids[mask], scores[mask]
    order = np.lexsort((doc_ids, -scores))[:k]
    return doc_ids[order], scores[order]


def exhaustive_topk(reader: IndexReader, query: str, k: int):
    """Decode-everything BM25 over the segments (pruning-free baseline)."""
    terms = sorted(set(tokenize(query)))
    cand: list[np.ndarray] = []
    decoded = []
    for t in terms:
        pair = reader.decoded(t)
        if pair is None:
            continue
        docs, tfs = pair
        decoded.append((t, docs, tfs))
        cand.append(docs)
    if not decoded:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    if len(decoded) == 1:  # single-term: no accumulation array needed
        t, docs, tfs = decoded[0]
        scores = _bm25_vec(tfs, reader.doc_lens[docs], reader.avgdl,
                           reader.idf(t))
        return _topk_from_arrays(docs, scores, k)
    n_total = sum(len(d) for _, d, _ in decoded)
    n_docs = len(reader.doc_lens)
    if n_total > 0.3 * n_docs:
        # dense accumulation: cheaper than unique+searchsorted when the
        # candidate set approaches the corpus (hot-term queries)
        scores = np.zeros(n_docs, dtype=np.float64)
        hit = np.zeros(n_docs, dtype=bool)
        for t, docs, tfs in decoded:   # lexicographic == pinned sum order
            scores[docs] += _bm25_vec(tfs, reader.doc_lens[docs],
                                      reader.avgdl, reader.idf(t))
            hit[docs] = True
        all_docs = np.flatnonzero(hit)
        return _topk_from_arrays(all_docs, scores[all_docs], k)
    all_docs = np.unique(np.concatenate(cand))
    scores = np.zeros(len(all_docs), dtype=np.float64)
    dls = reader.doc_lens[all_docs]
    for t, docs, tfs in decoded:  # lexicographic term order == pinned sum order
        pos = np.searchsorted(all_docs, docs)
        scores[pos] += _bm25_vec(tfs, dls[pos], reader.avgdl, reader.idf(t))
    return _topk_from_arrays(all_docs, scores, k)


_WINDOW = 8  # posting blocks decoded/skipped per cursor step
# When every query term is this frequent, WAND cannot prune (every doc
# is a near-candidate) and the pivot walk only adds overhead — score
# exhaustively instead.  Lossless: both paths produce identical results
# (same pinned summation order), verified by the conformance suite.
_DENSE_DF_FRAC = 0.1


class _Cursor:
    """Posting cursor over a WINDOW of blocks (vectorized decode).

    Skips happen at window granularity: the window upper bound is the
    max block_max_tf inside it — a valid (if slightly looser) bound, so
    the strict-< skip rule of spec A.5 is preserved exactly.
    """

    __slots__ = ("term", "enc", "idf", "term_ub", "n_blocks", "win_start",
                 "win_end", "docs", "tfs", "pos", "cur_doc", "win_ub",
                 "_dl_min", "_avgdl")

    def __init__(self, term: str, enc: codec.EncodedPostings, idf_t: float,
                 dl_min: float, avgdl: float):
        self.term = term
        self.enc = enc
        self.idf = idf_t
        self._dl_min = dl_min
        self._avgdl = avgdl
        mtf = float(enc.max_tf)
        self.term_ub = idf_t * mtf / (mtf + K1 * (1.0 - B + B * dl_min / avgdl))
        self.n_blocks = len(enc.block_last_doc)
        self.docs = None
        self.tfs = None
        self.pos = 0
        self.cur_doc = -1
        self._load_window(0)
        self.cur_doc = int(self.docs[0])

    def _load_window(self, bi: int) -> None:
        e = self.enc
        bj = min(bi + _WINDOW, self.n_blocks)          # exclusive
        d0 = int(e.block_off_docs[bi])
        d1 = int(e.block_off_docs[bj]) if bj < self.n_blocks else len(e.doc_bytes)
        deltas = codec.varbyte_decode(e.doc_bytes[d0:d1]).astype(np.int64)
        base = int(e.block_last_doc[bi - 1]) if bi > 0 else 0
        self.docs = base + np.cumsum(deltas)
        self.tfs = None
        self.win_start = bi
        self.win_end = bj
        mtf = float(e.block_max_tf[bi:bj].max())
        self.win_ub = self.idf * mtf / (
            mtf + K1 * (1.0 - B + B * self._dl_min / self._avgdl))
        self.pos = 0

    def _load_tfs(self) -> None:
        e = self.enc
        t0 = int(e.block_off_tfs[self.win_start])
        t1 = int(e.block_off_tfs[self.win_end]) \
            if self.win_end < self.n_blocks else len(e.tf_bytes)
        self.tfs = codec.varbyte_decode(e.tf_bytes[t0:t1]).astype(np.int64)

    def window_last(self) -> int:
        return int(self.enc.block_last_doc[self.win_end - 1])

    def slice_to(self, range_end: int) -> tuple[np.ndarray, np.ndarray]:
        """Postings in [cur_doc, range_end] (range_end <= window_last)."""
        if self.tfs is None:
            self._load_tfs()
        hi = int(np.searchsorted(self.docs, range_end, side="right"))
        return self.docs[self.pos:hi], self.tfs[self.pos:hi]

    def next_geq(self, target: int) -> int:
        """Advance to first doc >= target; returns cur_doc or -1 (end)."""
        if self.cur_doc >= target:
            return self.cur_doc
        if target > self.enc.last_doc:
            self.cur_doc = -1
            return -1
        if target > self.window_last():
            bi = int(np.searchsorted(self.enc.block_last_doc, target))
            self._load_window(bi)
        self.pos = int(np.searchsorted(self.docs, target))
        self.cur_doc = int(self.docs[self.pos])
        return self.cur_doc


def _anchor_topk(reader, present: list, rare_cut: float, k: int):
    """Vectorized rare-anchor scoring: exact scores for every doc that
    contains at least one rare term; every other doc's score is bounded
    by the frequent terms' UB sum.  Returns None when the prune bound
    fails (caller falls back to exhaustive — lossless either way)."""
    rare_terms = [t for t, e in present if e[1] <= rare_cut]
    freq_terms = [t for t, e in present if e[1] > rare_cut]
    cand_parts = []
    for t in rare_terms:
        pair = reader.decoded(t)
        if pair is not None:
            cand_parts.append(pair[0])
    if not cand_parts:
        return None
    cand = np.unique(np.concatenate(cand_parts))
    if len(cand) < k:
        return None                    # heap can't fill from anchors alone
    scores = np.zeros(len(cand), dtype=np.float64)
    dls = reader.doc_lens[cand]
    for t, _e in present:              # lexicographic == pinned sum order
        pair = reader.decoded(t)
        if pair is None:
            continue
        docs_t, tfs_t = pair
        pos = np.searchsorted(docs_t, cand)
        pos_c = np.minimum(pos, len(docs_t) - 1)
        hit = docs_t[pos_c] == cand
        scores[hit] += _bm25_vec(tfs_t[pos_c[hit]], dls[hit],
                                 reader.avgdl, reader.idf(t))
    kth = np.partition(scores, len(scores) - k)[len(scores) - k]
    ub_outside = 0.0
    for t in freq_terms:
        e = reader.dictionary[t]
        mtf = float(e[3])
        ub_outside += reader.idf(t) * mtf / (
            mtf + K1 * (1.0 - B + B * reader.dl_min / reader.avgdl))
    if ub_outside >= kth:              # never prune on equality (A.5)
        return None
    return _topk_from_arrays(cand, scores, k)


def wand_topk(reader: IndexReader, query: str, k: int):
    """Block-max WAND per the pinned contract (spec A.5), vectorized.

    The classic pivot walk runs at window granularity: an aligned pivot
    evaluates the whole doc range [pivot_doc, range_end] with numpy
    (contributions added in lexicographic term order — identical float
    summation to the exhaustive path), and a window whose block-max
    upper-bound sum is strictly below tau is skipped wholesale without
    decoding its tf stream.
    """
    terms = sorted(set(tokenize(query)))
    present = [(t, reader.dictionary[t]) for t in terms
               if t in reader.dictionary]
    if present:
        dfs = [e[1][1] for e in present]
        min_df, sum_df = min(dfs), sum(dfs)
        # Path policy (all three paths are lossless — identical results,
        # conformance-tested; they differ only in cost):
        #   rare anchor + heavy terms -> vectorized candidate scoring
        #     with an upper-bound prune (anchor path);
        #   no selective term / pivot walk too long -> vectorized dense;
        #   else -> classic windowed block-max WAND pivot walk.
        wand_iters = sum_df / (BLOCK_SIZE * _WINDOW)
        rare_cut = reader.N / 1000
        if min_df <= rare_cut and wand_iters > 1500:
            res = _anchor_topk(reader, present, rare_cut, k)
            if res is not None:
                return res
            return exhaustive_topk(reader, query, k)
        if (min_df >= _DENSE_DF_FRAC * reader.N
                or (min_df > rare_cut and wand_iters > 1500)):
            return exhaustive_topk(reader, query, k)
    cursors: list[_Cursor] = []
    for t in terms:
        enc = reader.postings(t)
        if enc is not None:
            cursors.append(_Cursor(t, enc, reader.idf(t),
                                   reader.dl_min, reader.avgdl))
    if not cursors:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    lex_order = list(cursors)          # fixed lexicographic evaluation order
    heap: list[tuple[float, int]] = []  # (score, -doc_id): min = worst kept
    avgdl = reader.avgdl
    doc_lens = reader.doc_lens
    alive = list(cursors)
    while alive:
        alive.sort(key=lambda c: c.cur_doc)
        full = len(heap) >= k
        tau = heap[0][0] if full else -np.inf
        # pivot: first prefix whose term-UB sum could still reach tau
        acc = 0.0
        pivot_idx = -1
        for i, c in enumerate(alive):
            acc += c.term_ub
            if not full or acc >= tau:   # never skip on equality (A.5)
                pivot_idx = i
                break
        if pivot_idx < 0:
            break                        # no prefix can reach tau -> done
        pivot_doc = alive[pivot_idx].cur_doc
        if alive[0].cur_doc < pivot_doc:
            # WAND guarantee: no doc < pivot_doc can reach tau, so every
            # lagging cursor may jump straight to the pivot (lossless)
            for c in alive:
                if c.cur_doc < pivot_doc:
                    c.next_geq(pivot_doc)
            alive = [c for c in alive if c.cur_doc >= 0]
            continue
        # aligned: evaluate a window-bounded doc range vectorized.  The
        # range covers every alive cursor whose postings fall inside it
        # (fixed-point on the window ends), so ranges stay wide even when
        # cursors interleave densely (hot-term conjunctions).
        range_end = min(c.window_last() for c in alive
                        if c.cur_doc == pivot_doc)
        while True:
            included = [c for c in alive if c.cur_doc <= range_end]
            new_end = min(c.window_last() for c in included)
            if new_end >= range_end:
                break
            range_end = new_end
        included = [c for c in alive if c.cur_doc <= range_end]
        if full and sum(c.win_ub for c in included) < tau:
            # block-max skip: nothing in this range can reach tau (strict)
            for c in included:
                c.next_geq(range_end + 1)
            alive = [c for c in alive if c.cur_doc >= 0]
            continue
        inc_set = set(id(c) for c in included)
        slices = [(c, *c.slice_to(range_end))
                  for c in lex_order if id(c) in inc_set]
        cand = np.unique(np.concatenate([d for _, d, _ in slices]))
        scores = np.zeros(len(cand), dtype=np.float64)
        dls = doc_lens[cand]
        for c, d, t in slices:           # lexicographic == pinned sum order
            pos = np.searchsorted(cand, d)
            tf = t.astype(np.float64)
            scores[pos] += c.idf * tf / (
                tf + K1 * (1.0 - B + B * dls[pos] / avgdl))
        if full:
            keep = scores >= tau         # ties fully evaluated (A.5)
            cand, scores = cand[keep], scores[keep]
        for s, d in zip(scores.tolist(), cand.tolist()):
            key = (s, -d)
            if len(heap) < k:
                heapq.heappush(heap, key)
            elif key > heap[0]:
                heapq.heapreplace(heap, key)
        for c in included:
            c.next_geq(range_end + 1)
        alive = [c for c in alive if c.cur_doc >= 0]
    out = sorted(heap, key=lambda x: (-x[0], -x[1]))
    return (np.array([-d for _, d in out], dtype=np.int64),
            np.array([s for s, _ in out], dtype=np.float64))


def exhaustive_range_topk(reader, query: str, k: int, lo: int, hi: int):
    """Exact BM25 top-k restricted to doc_ids in [lo, hi) — the shard
    kernel for doc-sharded parallel scoring (SURVEY.md G4).  Per-shard
    top-k with the GLOBAL k is a superset of the global top-k within the
    shard, so merging shard candidates by (-score, doc_id) reproduces
    the global ranking exactly (scores are exact, pinned sum order)."""
    terms = sorted(set(tokenize(query)))
    decoded = []
    cand = []
    for t in terms:
        pair = reader.decoded_range(t, lo, hi)
        if pair is None or len(pair[0]) == 0:
            continue
        docs, tfs = pair
        decoded.append((t, docs, tfs))
        cand.append(docs)
    if not decoded:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    if len(decoded) == 1:
        t, docs, tfs = decoded[0]
        scores = _bm25_vec(tfs, reader.doc_lens[docs], reader.avgdl,
                           reader.idf(t))
        return _topk_from_arrays(docs, scores, k)
    all_docs = np.unique(np.concatenate(cand))
    scores = np.zeros(len(all_docs), dtype=np.float64)
    dls = reader.doc_lens[all_docs]
    for t, docs, tfs in decoded:       # lexicographic == pinned sum order
        pos = np.searchsorted(all_docs, docs)
        scores[pos] += _bm25_vec(tfs, dls[pos], reader.avgdl, reader.idf(t))
    return _topk_from_arrays(all_docs, scores, k)


# a query is "heavy" (worth doc-sharding across tasks) past this many
# candidate postings; shards sized so each handles ~SHARD_POSTINGS
HEAVY_POSTINGS = 1_000_000
SHARD_POSTINGS = 500_000


def plan_query_shards(dictionary: dict, n_docs: int, query: str,
                      max_shards: int) -> list[tuple[int, int]]:
    """Doc-range shards for one query: [(lo, hi), ...] covering [0, N).
    Light queries get a single full-range shard."""
    terms = sorted(set(tokenize(query)))
    sum_df = sum(dictionary[t][1] for t in terms if t in dictionary)
    if sum_df < HEAVY_POSTINGS or max_shards <= 1:
        return [(0, n_docs)]
    r = int(min(max_shards, max(2, sum_df // SHARD_POSTINGS)))
    bounds = np.linspace(0, n_docs, r + 1).astype(np.int64)
    return [(int(bounds[i]), int(bounds[i + 1])) for i in range(r)]


class _SegmentBrokerImpl:
    """Cluster-wide on-demand segment share: reads + ``ray.put``s each
    bucket file ONCE on first touch and memoizes the plasma ref.  Every
    scorer actor asks the broker instead of re-reading from disk, so
    per-index I/O is one read per touched bucket and plasma footprint is
    bounded by TOUCHED buckets — the larger-than-RAM form share_index's
    eager loop could not give (it pinned the whole index up front).
    The actor holds only refs (the tables live in the object store)."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self._refs: dict[int, "ray.ObjectRef"] = {}

    def bucket_ref(self, bucket: int) -> "ray.ObjectRef":
        import ray as _ray
        ref = self._refs.get(bucket)
        if ref is None:
            path = os.path.join(self.index_dir, "segments",
                                f"bucket={bucket}.parquet")
            ref = self._refs[bucket] = _ray.put(pq.read_table(path))
        return ref

    def touched(self) -> list[int]:
        return sorted(self._refs)


def share_index(index_dir: str, segments: str = "ondemand") -> "ray.ObjectRef":
    """Load the index ONCE and put it in the object store: the returned
    ref (a dict of refs) feeds IndexReader(shared=...) in every scorer
    actor — zero-copy arrow/numpy views instead of per-actor disk reads.

    segments="ondemand" (default): buckets are shared lazily through a
    broker actor (read + put on first touch, memoized) — plasma holds
    only the buckets queries actually hit, which is what a
    larger-than-RAM index needs.  segments="eager": every bucket file is
    put up front (lowest first-touch latency; only viable while the
    whole index fits in plasma).  Memoized per process per mode."""
    import ray as _ray
    cache = share_index.__dict__.setdefault("_cache", {})
    key = (index_dir, segments)
    if key in cache:
        return cache[key]
    base = IndexReader(index_dir)
    seg_refs = None
    broker = None
    if segments == "eager":
        seg_refs = {}
        for path in sorted(glob.glob(os.path.join(index_dir, "segments",
                                                  "*.parquet"))):
            bucket = int(os.path.basename(path).split("=")[1].split(".")[0])
            seg_refs[bucket] = _ray.put(pq.read_table(path))
    else:
        broker = _ray.remote(num_cpus=0)(_SegmentBrokerImpl).remote(index_dir)
    # pre-decode the hottest posting lists ONCE: every scorer actor (and
    # every serve call in this process) then reads the decoded arrays
    # zero-copy from plasma instead of re-decoding O(df) varbytes.
    # Relative threshold + posting budget — a Zipf head has MANY large
    # terms at scale, and pre-decoding them all would blow plasma.
    decoded_refs = {}
    d = base.dictionary
    if len(d) and base.N:
        frac = np.asarray(d.df, dtype=np.float64) / base.N
        order = np.argsort(-np.asarray(d.df))
        budget = 16 * base.N                   # max pre-decoded postings
        used = 0
        for i in order:
            if frac[i] < 0.10:
                break                  # df-sorted: no smaller term qualifies
            if used + d.df[i] > budget:
                continue               # skip the big one, keep filling

            t = d.terms[i]
            decoded_refs[t] = _ray.put(base.decoded(t))
            used += int(d.df[i])
    payload = {"dictionary": _ray.put(base.dictionary),
               "doc_lens": _ray.put(base.doc_lens),
               "decoded": decoded_refs}
    if seg_refs is not None:
        payload["segments"] = seg_refs
    else:
        payload["segments_broker"] = broker
    ref = _ray.put(payload)
    if len(cache) > 4:
        cache.clear()
    cache[key] = ref
    return ref


_WORKER_READERS: dict = {}


def _worker_reader(index_dir: str, shared) -> IndexReader:
    """Per-worker-process IndexReader singleton over the shared index
    (plasma views — construction is cheap, but the posting/decode caches
    are worth keeping warm across tasks)."""
    r = _WORKER_READERS.get(index_dir)
    if r is None:
        _WORKER_READERS.clear()
        r = _WORKER_READERS[index_dir] = IndexReader(index_dir, shared=shared)
    return r


def _score_shard(index_dir: str, shared, query: str, k: int,
                 lo: int, hi: int):
    reader = _worker_reader(index_dir, shared)
    return exhaustive_range_topk(reader, query, k, lo, hi)


def topk_auto(reader: IndexReader, query: str, k: int, *,
              index_dir: str, shared, max_shards: int | None = None):
    """Single-query top-k with automatic heavy-query parallelism: light
    queries run block-max WAND in-process; heavy (stopword-class)
    queries fan their doc-range shards out as raw Ray tasks against the
    plasma-shared index and merge the (exact) shard candidates — the
    per-query latency form of run_queries(mode="auto"), closing the
    p95 tail a single process cannot (one process must scan every
    posting of a hot term; ten shards scan a tenth each)."""
    import ray as _ray
    if max_shards is None:
        max_shards = max(1, int(_ray.cluster_resources().get("CPU", 4)) - 1)
    shards = plan_query_shards(reader.dictionary, len(reader.doc_lens),
                               query, max_shards)
    if len(shards) <= 1:
        return wand_topk(reader, query, k)
    fn = topk_auto.__dict__.get("_task")
    if fn is None:
        fn = topk_auto.__dict__["_task"] = _ray.remote(num_cpus=1)(_score_shard)
    parts = _ray.get([fn.remote(index_dir, shared, query, k, lo, hi)
                      for lo, hi in shards])
    # disjoint ascending ranges -> concatenation stays ascending-unique
    docs = np.concatenate([d for d, _ in parts])
    scores = np.concatenate([s for _, s in parts])
    return _topk_from_arrays(docs, scores, k)


class ShardScorer:
    """Actor-pool stage over (query_id, query, lo, hi) shard rows —
    emits per-shard candidate top-k; the driver (or a groupby) merges.
    Index (and decoded hot postings, cached) opened once per actor."""

    def __init__(self, index_dir: str, k: int, shared=None):
        self.reader = IndexReader(index_dir, shared=shared)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, docs_out, scores_out = [], [], []
        for qid, q, lo, hi in zip(batch.column("query_id").to_pylist(),
                                  batch.column("query").to_pylist(),
                                  batch.column("lo").to_pylist(),
                                  batch.column("hi").to_pylist()):
            if lo == 0 and hi >= len(self.reader.doc_lens):
                d, s = wand_topk(self.reader, q, self.k)
            else:
                d, s = exhaustive_range_topk(self.reader, q, self.k, lo, hi)
            qids.extend([qid] * len(d))
            docs_out.extend(d.tolist())
            scores_out.extend(s.tolist())
        return pa.table({
            "query_id": pa.array(qids, pa.int64()),
            "doc_id": pa.array(docs_out, pa.int64()),
            "score": pa.array(scores_out, pa.float64()),
        })


class QueryScorer:
    """A3: actor-pool query stage.  Index opened once per actor."""

    def __init__(self, index_dir: str, k: int = 10, mode: str = "wand",
                 shared=None):
        self.reader = IndexReader(index_dir, shared=shared)
        self.k = k
        self.fn = wand_topk if mode == "wand" else exhaustive_topk

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids_out, ranks, docs_out, scores_out = [], [], [], []
        for qid, q in zip(batch.column("query_id").to_pylist(),
                          batch.column("query").to_pylist()):
            docs, scores = self.fn(self.reader, q, self.k)
            qids_out.extend([qid] * len(docs))
            ranks.extend(range(1, len(docs) + 1))
            docs_out.extend(docs.tolist())
            scores_out.extend(scores.tolist())
        return pa.table({
            "query_id": pa.array(qids_out, pa.int64()),
            "rank": pa.array(ranks, pa.int32()),
            "doc_id": pa.array(docs_out, pa.int64()),
            "score": pa.array(scores_out, pa.float64()),
        })


class MemoryIndex:
    """A fully in-memory index over a small (doc_id, text) table, duck-
    typed to IndexReader's scoring surface — used for embedded/unit use
    and the randomized WAND conformance suite (SURVEY.md §5.2): it goes
    through the REAL codec (encode_postings) so block-max metadata and
    window decode paths are exercised without a Ray build."""

    def __init__(self, corpus: pa.Table):
        from collections import Counter, defaultdict
        texts = corpus.column("text").to_pylist()
        doc_ids = corpus.column("doc_id").to_pylist()
        post: dict[str, list] = defaultdict(list)
        max_doc = max(doc_ids) if doc_ids else 0
        self.doc_lens = np.zeros(max_doc + 1, dtype=np.float64)
        total = 0
        for d, text in sorted(zip(doc_ids, texts)):
            toks = tokenize(text)
            self.doc_lens[d] = len(toks)
            total += len(toks)
            for t, tf in Counter(toks).items():
                post[t].append((d, tf))
        self.N = float(len(doc_ids))
        self.avgdl = total / self.N if self.N else 0.0
        self.dl_min = max(1.0, float(min((x for x in self.doc_lens if x > 0),
                                         default=1.0)))
        self._enc: dict[str, codec.EncodedPostings] = {}
        self.dictionary: dict[str, tuple[int, int, int, int]] = {}
        for t, plist in post.items():
            docs = np.array([p[0] for p in plist], dtype=np.int64)
            tfs = np.array([p[1] for p in plist], dtype=np.int64)
            enc = self._enc[t] = codec.encode_postings(docs, tfs)
            self.dictionary[t] = (0, enc.n, int(tfs.sum()), enc.max_tf)
        self._decoded_cache: dict[str, tuple] = {}

    def postings(self, term: str):
        return self._enc.get(term)

    def decoded(self, term: str):
        enc = self._enc.get(term)
        if enc is None:
            return None
        if term not in self._decoded_cache:
            self._decoded_cache[term] = codec.decode_postings(
                enc.doc_bytes, enc.tf_bytes, enc.n)
        return self._decoded_cache[term]

    def idf(self, term: str) -> float:
        entry = self.dictionary.get(term)
        return idf_fn(self.N, float(entry[1])) if entry else 0.0

    def topk(self, query: str, k: int = 10):
        return wand_topk(self, query, k)


class OracleScorer:
    """A4 (test-only): naive exhaustive BM25 straight from a corpus table —
    shares no index/codec code with the engine; used to pin rank-identity.
    """

    def __init__(self, corpus: pa.Table):
        texts = corpus.column("text").to_pylist()
        doc_ids = corpus.column("doc_id").to_pylist()
        self.index: dict[str, dict[int, int]] = {}
        self.dl: dict[int, int] = {}
        for d, text in zip(doc_ids, texts):
            toks = tokenize(text)
            self.dl[d] = len(toks)
            for t in toks:
                self.index.setdefault(t, {})
                self.index[t][d] = self.index[t].get(d, 0) + 1
        self.N = len(doc_ids)
        total = sum(self.dl.values())
        self.avgdl = total / self.N if self.N else 0.0

    def topk(self, query: str, k: int):
        terms = sorted(set(tokenize(query)))
        scores: dict[int, float] = {}
        for t in terms:
            plist = self.index.get(t)
            if not plist:
                continue
            idf_t = idf_fn(self.N, len(plist))
            for d, tf in plist.items():
                dl = self.dl[d]
                scores[d] = scores.get(d, 0.0) + \
                    idf_t * tf / (tf + K1 * (1.0 - B + B * dl / self.avgdl))
        best = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return ([d for d, _ in best], [s for _, s in best])
