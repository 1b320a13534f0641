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
from web_search_engine_ray.spec import B, K1, idf as idf_fn, tokenize
from web_search_engine_ray.state.manifest import read_stats


class IndexReader:
    """Opens an index dir once (per QueryScorer actor): dictionary,
    corpus stats, doc_len array, lazy per-bucket segment tables + an
    in-actor posting cache.  Scale note: at 10^12 docs the doc_len array
    and dictionary become doc-sharded / filtered parquet reads; the
    segment access pattern (columnar row lookup by sorted term) holds.
    """

    def __init__(self, index_dir: str, max_cached_terms: int = 4096):
        self.index_dir = index_dir
        self.stats = read_stats(index_dir)
        self.N = float(self.stats["n_docs"])
        self.avgdl = float(self.stats["avgdl"])
        self.dl_min = float(self.stats["dl_min"])
        # dictionary: term -> (bucket, df, cf, max_tf)
        self.dictionary: dict[str, tuple[int, int, int, int]] = {}
        for path in sorted(glob.glob(os.path.join(index_dir, "dictionary", "*.parquet"))):
            t = pq.read_table(path)
            for term, bucket, df, cf, mtf in zip(
                    t.column("term").to_pylist(), t.column("bucket").to_pylist(),
                    t.column("df").to_pylist(), t.column("cf").to_pylist(),
                    t.column("max_tf").to_pylist()):
                self.dictionary[term] = (bucket, df, cf, mtf)
        # dense doc_len array indexed by doc_id
        dt = pq.read_table(os.path.join(index_dir, "doc_table"),
                           columns=["doc_id", "doc_len"])
        n = int(self.stats["max_doc_id"]) + 1
        self.doc_lens = np.zeros(max(n, 1), dtype=np.float64)
        self.doc_lens[dt.column("doc_id").to_numpy()] = \
            dt.column("doc_len").to_numpy().astype(np.float64)
        self._seg_cache: dict[int, pa.Table] = {}
        self._post_cache: dict[str, codec.EncodedPostings] = {}
        self._max_cached_terms = max_cached_terms

    def _bucket_table(self, bucket: int) -> pa.Table:
        tbl = self._seg_cache.get(bucket)
        if tbl is None:
            path = os.path.join(self.index_dir, "segments", f"bucket={bucket}.parquet")
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
    if len(doc_ids) == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    order = np.lexsort((doc_ids, -scores))[:k]
    return doc_ids[order], scores[order]


def exhaustive_topk(reader: IndexReader, query: str, k: int):
    """Decode-everything BM25 over the segments (pruning-free baseline)."""
    terms = sorted(set(tokenize(query)))
    cand: list[np.ndarray] = []
    decoded = []
    for t in terms:
        enc = reader.postings(t)
        if enc is None:
            continue
        docs, tfs = codec.decode_postings(enc.doc_bytes, enc.tf_bytes, enc.n)
        decoded.append((t, docs, tfs))
        cand.append(docs)
    if not decoded:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    all_docs = np.unique(np.concatenate(cand))
    scores = np.zeros(len(all_docs), dtype=np.float64)
    dls = reader.doc_lens[all_docs]
    for t, docs, tfs in decoded:  # lexicographic term order == pinned sum order
        pos = np.searchsorted(all_docs, docs)
        scores[pos] += _bm25_vec(tfs, dls[pos], reader.avgdl, reader.idf(t))
    return _topk_from_arrays(all_docs, scores, k)


class _Cursor:
    __slots__ = ("term", "enc", "idf", "term_ub", "n_blocks", "block",
                 "docs", "tfs", "pos", "cur_doc", "reader", "_tf_loaded")

    def __init__(self, term: str, enc: codec.EncodedPostings, idf_t: float,
                 dl_min: float, avgdl: float):
        self.term = term
        self.enc = enc
        self.idf = idf_t
        mtf = float(enc.max_tf)
        self.term_ub = idf_t * mtf / (mtf + K1 * (1.0 - B + B * dl_min / avgdl))
        self.n_blocks = len(enc.block_last_doc)
        self.block = -1
        self.docs = None
        self.tfs = None
        self._tf_loaded = False
        self.pos = 0
        self.cur_doc = -1
        self._load_block(0)
        self.cur_doc = int(self.docs[0])

    def _load_block(self, bi: int) -> None:
        e = self.enc
        d0 = int(e.block_off_docs[bi])
        d1 = int(e.block_off_docs[bi + 1]) if bi + 1 < self.n_blocks else len(e.doc_bytes)
        deltas = codec.varbyte_decode(e.doc_bytes[d0:d1]).astype(np.int64)
        base = int(e.block_last_doc[bi - 1]) if bi > 0 else 0
        self.docs = base + np.cumsum(deltas)
        self.block = bi
        self._tf_loaded = False
        self.pos = 0

    def _load_tfs(self) -> None:
        e = self.enc
        bi = self.block
        t0 = int(e.block_off_tfs[bi])
        t1 = int(e.block_off_tfs[bi + 1]) if bi + 1 < self.n_blocks else len(e.tf_bytes)
        self.tfs = codec.varbyte_decode(e.tf_bytes[t0:t1]).astype(np.int64)
        self._tf_loaded = True

    def block_ub(self, dl_min: float, avgdl: float) -> float:
        mtf = float(self.enc.block_max_tf[self.block])
        return self.idf * mtf / (mtf + K1 * (1.0 - B + B * dl_min / avgdl))

    def tf(self) -> int:
        if not self._tf_loaded:
            self._load_tfs()
        return int(self.tfs[self.pos])

    def next_geq(self, target: int) -> int:
        """Advance to first doc >= target; returns cur_doc or -1 (end)."""
        if self.cur_doc >= target:
            return self.cur_doc
        if target > self.enc.last_doc:
            self.cur_doc = -1
            return -1
        bi = int(np.searchsorted(self.enc.block_last_doc, target))
        if bi != self.block:
            self._load_block(bi)
        self.pos = int(np.searchsorted(self.docs, target))
        self.cur_doc = int(self.docs[self.pos])
        return self.cur_doc


def wand_topk(reader: IndexReader, query: str, k: int):
    """Block-max WAND per the pinned contract (spec A.5)."""
    terms = sorted(set(tokenize(query)))
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
    avgdl, dl_min = reader.avgdl, reader.dl_min
    alive = [c for c in cursors if c.cur_doc >= 0]
    while alive:
        alive.sort(key=lambda c: c.cur_doc)
        tau = heap[0][0] if len(heap) >= k else -np.inf
        # pivot: first prefix whose term-UB sum could still beat tau
        acc = 0.0
        pivot_idx = -1
        for i, c in enumerate(alive):
            acc += c.term_ub
            if acc >= tau:      # never skip on equality (A.5)
                pivot_idx = i
                break
        if pivot_idx < 0:
            break               # no prefix can reach tau -> done
        pivot_doc = alive[pivot_idx].cur_doc
        if alive[0].cur_doc == pivot_doc:
            # all cursors [0..pivot] aligned; block-max refinement first
            at_pivot = [c for c in alive if c.cur_doc == pivot_doc]
            block_acc = sum(c.block_ub(dl_min, avgdl) for c in at_pivot)
            if block_acc >= tau:
                dl = reader.doc_lens[pivot_doc]
                score = 0.0
                for c in lex_order:  # pinned summation order
                    if c.cur_doc == pivot_doc:
                        tf = float(c.tf())
                        score += c.idf * tf / (tf + K1 * (1.0 - B + B * dl / avgdl))
                key = (score, -pivot_doc)
                if len(heap) < k:
                    heapq.heappush(heap, key)
                elif key > heap[0]:
                    heapq.heapreplace(heap, key)
            for c in at_pivot:
                c.next_geq(pivot_doc + 1)
        else:
            # advance the highest-UB cursor strictly before the pivot doc
            # (must make progress: cursors AT pivot_doc are not candidates)
            behind = [c for c in alive[:pivot_idx + 1] if c.cur_doc < pivot_doc]
            adv = max(behind, key=lambda c: c.term_ub)
            adv.next_geq(pivot_doc)
        alive = [c for c in alive if c.cur_doc >= 0]
    out = sorted(heap, key=lambda x: (-x[0], -x[1]))
    return (np.array([-d for _, d in out], dtype=np.int64),
            np.array([s for s, _ in out], dtype=np.float64))


class QueryScorer:
    """A3: actor-pool query stage.  Index opened once per actor."""

    def __init__(self, index_dir: str, k: int = 10, mode: str = "wand"):
        self.reader = IndexReader(index_dir)
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
