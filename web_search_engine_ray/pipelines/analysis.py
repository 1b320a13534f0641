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
N_BANDS = 16
SHINGLE_K = 3


class MinHashStage:
    """Actor-pool stage: doc -> (band_id, band_key, doc_id) LSH rows.
    The hasher (permutation coefficients) is built once per actor."""

    def __init__(self, n_perm: int = N_PERM, n_bands: int = N_BANDS,
                 k: int = SHINGLE_K):
        self.hasher = tp.FastMinHasher(n_perm)
        self.n_bands = n_bands
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, band_ids, keys = [], [], []
        for d, text in zip(batch.column("doc_id").to_pylist(),
                           batch.column("text").to_pylist()):
            sig = self.hasher.signature(tp.shingle_hashes(text, self.k))
            for b, key in enumerate(tp.minhash_bands(sig, self.n_bands)):
                doc_ids.append(d)
                band_ids.append(b)
                keys.append(key)
        return pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                         "band_id": pa.array(band_ids, pa.int32()),
                         "band_key": pa.array(keys, pa.string())})


def _bucket_pairs(group: pa.Table, max_bucket: int = 64) -> pa.Table:
    """Candidate pairs within one LSH bucket (bounded fan-out)."""
    ids = sorted(group.column("doc_id").to_pylist())[:max_bucket]
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pa.table({"doc_id_a": pa.array(a, pa.int64()),
                     "doc_id_b": pa.array(b, pa.int64())})


def minhash_candidates(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """doc -> minhash signature -> LSH banding -> distinct candidate pairs."""
    from ray.data.aggregate import Count
    bands = docs.select_columns(["doc_id", "text"]).map_batches(
        MinHashStage, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, 8))
    pairs = (bands.groupby(["band_id", "band_key"])
             .map_groups(_bucket_pairs, batch_format="pyarrow"))
    # distinct pairs (a pair can collide in several bands)
    return pairs.groupby(["doc_id_a", "doc_id_b"]).aggregate(Count())


def near_dup_pairs(docs: "ray.data.Dataset", docs_path: str,
                   threshold: float = 0.8) -> pa.Table:
    """MinHash-LSH candidates verified with exact shingle Jaccard.

    Verification reads only the candidate docs' texts via a filtered
    parquet read (candidate sets are tiny vs the corpus); at larger
    candidate volumes this becomes a broadcast join keyed by doc_id.
    """
    import pyarrow.parquet as pq
    cand = minhash_candidates(docs).to_pandas()
    if len(cand) == 0:
        return pa.table({"doc_id_a": pa.array([], pa.int64()),
                         "doc_id_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    wanted = sorted(set(cand["doc_id_a"]) | set(cand["doc_id_b"]))
    texts_tbl = pq.read_table(docs_path, columns=["doc_id", "text"],
                              filters=[("doc_id", "in", wanted)])
    texts = dict(zip(texts_tbl.column("doc_id").to_pylist(),
                     texts_tbl.column("text").to_pylist()))
    rows_a, rows_b, jac = [], [], []
    for a, b in zip(cand["doc_id_a"], cand["doc_id_b"]):
        j = tp.exact_jaccard(texts[a], texts[b], SHINGLE_K)
        if j >= threshold:
            rows_a.append(int(a))
            rows_b.append(int(b))
            jac.append(round(j, 6))
    order = np.lexsort((rows_b, rows_a))
    return pa.table({
        "doc_id_a": pa.array(np.array(rows_a, dtype=np.int64)[order]),
        "doc_id_b": pa.array(np.array(rows_b, dtype=np.int64)[order]),
        "jaccard": pa.array(np.array(jac, dtype=np.float64)[order]),
    })


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


def embedding_dup_pairs(embeddings: "ray.data.Dataset",
                        threshold: float = 0.45) -> pa.Table:
    """All pairs of vectors with cosine >= threshold.

    The full (normalized) matrix is broadcast once via ``ray.put``; each
    batch does one matmul against it and emits its qualifying pairs —
    O(N^2) similarity work split across batches with no shuffle.  Scale
    path: replace the broadcast full matrix with IVF/LSH bucket keys
    (pipelines/knn.py) so only same-bucket pairs are compared.
    """
    from web_search_engine_ray.pipelines.knn import _batch_matrix, _normalize
    full_tbl = pa.concat_tables(list(
        embeddings.select_columns(["vec_id", "embedding"])
        .iter_batches(batch_format="pyarrow")))
    order = np.argsort(full_tbl.column("vec_id").to_numpy())
    full_ids = full_tbl.column("vec_id").to_numpy()[order]
    full_mat = _normalize(_batch_matrix(full_tbl)[order])
    ref = ray.put((full_ids, full_mat))

    def pairs_batch(batch: pa.Table) -> pa.Table:
        ids_all, mat_all = ray.get(ref)
        vec_ids = batch.column("vec_id").to_numpy()
        m = _normalize(_batch_matrix(batch))
        sims = m @ mat_all.T
        rows_a, rows_b, s_out = [], [], []
        for r in range(sims.shape[0]):
            hit = np.flatnonzero(sims[r] >= threshold)
            for c in hit:
                if ids_all[c] > vec_ids[r]:      # each pair once, a < b
                    rows_a.append(int(vec_ids[r]))
                    rows_b.append(int(ids_all[c]))
                    s_out.append(round(float(sims[r, c]), 6))
        return pa.table({"vec_id_a": pa.array(rows_a, pa.int64()),
                         "vec_id_b": pa.array(rows_b, pa.int64()),
                         "sim": pa.array(s_out, pa.float64())})

    out = pa.concat_tables(list(
        embeddings.select_columns(["vec_id", "embedding"])
        .map_batches(pairs_batch, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=1024)
        .iter_batches(batch_format="pyarrow")))
    return out.sort_by([("vec_id_a", "ascending"), ("vec_id_b", "ascending")])


# --- SimHash near-dedup --------------------------------------------------


def simhash_batch(batch: pa.Table) -> pa.Table:
    hs = [tp.simhash64(t) for t in batch.column("text").to_pylist()]
    return pa.table({"doc_id": batch.column("doc_id"),
                     "simhash": pa.array(np.array(hs, dtype=np.uint64)
                                         .astype(np.int64))})


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

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_pylist()
        hs = group.column("simhash").to_numpy().astype(np.uint64)
        order = np.argsort(ids)
        a, b, dist = [], [], []
        for i in range(len(order)):
            for j in range(i + 1, len(order)):
                ii, jj = order[i], order[j]
                hd = tp.hamming64(int(hs[ii]), int(hs[jj]))
                if hd <= max_hamming:
                    a.append(ids[ii])
                    b.append(ids[jj])
                    dist.append(hd)
        return pa.table({"doc_id_a": pa.array(a, pa.int64()),
                         "doc_id_b": pa.array(b, pa.int64()),
                         "hamming": pa.array(dist, pa.int32())})

    from ray.data.aggregate import Min
    pairs = (sims.map_batches(expand, batch_format="pyarrow")
             .groupby(["band_id", "band_key"])
             .map_groups(bucket_pairs, batch_format="pyarrow")
             .groupby(["doc_id_a", "doc_id_b"]).aggregate(Min("hamming")))
    tbl = pa.concat_tables(list(pairs.iter_batches(batch_format="pyarrow"))) \
        if pairs.count() else pa.table({"doc_id_a": pa.array([], pa.int64()),
                                        "doc_id_b": pa.array([], pa.int64()),
                                        "min(hamming)": pa.array([], pa.int32())})
    return tbl.rename_columns(["doc_id_a", "doc_id_b", "hamming"]) \
        .sort_by([("doc_id_a", "ascending"), ("doc_id_b", "ascending")])
