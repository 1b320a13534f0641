"""Similarity search over an embedding column (list<float>):
brute-force cosine top-k (baseline) and an IVF-bucketed variant (the
scale path).

Brute force: the query matrix is broadcast once (``ray.put``) and every
batch does one numpy matmul; per-batch partial top-k rows are reduced by
a tiny per-query group merge — the corpus itself is never shuffled or
materialized.  IVF: deterministic seeded centroids, one assignment pass
(groupby centroid), queries probe the nearest ``nprobe`` centroid
buckets only.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa

import ray
import ray.data

from web_search_engine_ray.spec import derive_seed


def _batch_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceScorer:
    """Actor-pool stage: per batch, cosine vs the broadcast query matrix,
    emit per-batch top-k partials (query_id, vec_id, sim)."""

    def __init__(self, queries_ref, k: int):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) \
            else queries_ref
        self.qids = q["query_id"]
        self.qmat = _normalize(np.asarray(q["matrix"], dtype=np.float64))
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vec_ids = batch.column("vec_id").to_numpy()
        m = _normalize(_batch_matrix(batch))
        sims = m @ self.qmat.T                      # (n_vecs, n_queries)
        out_q, out_v, out_s = [], [], []
        k = min(self.k, sims.shape[0])
        for qi in range(sims.shape[1]):
            col = sims[:, qi]
            idx = np.argpartition(-col, k - 1)[:k] if k < len(col) else \
                np.arange(len(col))
            order = idx[np.lexsort((vec_ids[idx], -col[idx]))]
            out_q.append(np.full(len(order), self.qids[qi], dtype=np.int64))
            out_v.append(vec_ids[order])
            out_s.append(col[order])
        return pa.table({"query_id": np.concatenate(out_q),
                         "vec_id": np.concatenate(out_v),
                         "sim": np.concatenate(out_s)})


def _merge_topk_factory(k: int):
    def merge(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        v = group.column("vec_id").to_numpy()
        s = group.column("sim").to_numpy()
        order = np.lexsort((v, -s))[:k]
        return pa.table({
            "query_id": pa.array(np.full(len(order), qid, dtype=np.int64)),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int32)),
            "vec_id": pa.array(v[order]),
            "sim": pa.array(np.round(s[order], 6)),
        })
    return merge


def knn_bruteforce(embeddings: "ray.data.Dataset", query_ids: list[int],
                   query_matrix: np.ndarray, k: int = 10) -> pa.Table:
    """Exact cosine top-k for each query vector; ties break by vec_id."""
    ref = ray.put({"query_id": np.asarray(query_ids, dtype=np.int64),
                   "matrix": query_matrix})
    partials = embeddings.map_batches(
        BruteForceScorer, fn_constructor_args=(ref, k),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=4096,
        concurrency=(1, 8))
    merged = partials.groupby("query_id").map_groups(
        _merge_topk_factory(k), batch_format="pyarrow")
    batches = list(merged.iter_batches(batch_format="pyarrow"))
    tbl = pa.concat_tables(batches) if batches else pa.table(
        {"query_id": pa.array([], pa.int64()), "rank": pa.array([], pa.int32()),
         "vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())})
    return tbl.sort_by([("query_id", "ascending"), ("rank", "ascending")])


# --- IVF (scale path) ----------------------------------------------------


def ivf_centroids(embeddings: "ray.data.Dataset", n_centroids: int,
                  seed: int = 7, iters: int = 3) -> np.ndarray:
    """Deterministic k-means centroids: seeded-sample init + ``iters``
    distributed Lloyd iterations.

    Each iteration is one map_batches pass emitting per-batch partial
    (centroid_id, vector-sum, count) rows, combined driver-side —
    O(n_centroids × blocks) driver state, corpus never collected.
    Spherical k-means (normalize after every mean) since similarity is
    cosine."""
    n = embeddings.count()
    if n == 0:
        raise ValueError("cannot build IVF centroids over an empty corpus")
    g = np.random.Generator(np.random.PCG64(derive_seed(seed, "ivf")))
    ids = sorted(g.choice(n, size=min(n_centroids, n), replace=False).tolist())
    sample = embeddings.filter(expr=f"vec_id in {ids}")
    tbl = pa.concat_tables(list(sample.iter_batches(batch_format="pyarrow")))
    order = np.argsort(tbl.column("vec_id").to_numpy())
    cents = _normalize(_batch_matrix(tbl)[order])
    k, d = cents.shape
    for _ in range(iters):
        cent_ref = ray.put(cents)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)
            m = _normalize(_batch_matrix(batch))
            cid = np.argmax(m @ c.T, axis=1)
            sums = np.zeros((k, d))
            np.add.at(sums, cid, m)
            counts = np.bincount(cid, minlength=k).astype(np.int64)
            return pa.table({
                "cid": pa.array(np.arange(k, dtype=np.int32)),
                "vsum": pa.array(list(sums), pa.list_(pa.float64())),
                "cnt": pa.array(counts, pa.int64())})

        parts = pa.concat_tables(list(
            embeddings.select_columns(["vec_id", "embedding"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .iter_batches(batch_format="pyarrow")))
        cid = parts.column("cid").to_numpy()
        cnt = parts.column("cnt").to_numpy()
        vs = np.asarray(parts.column("vsum").to_pylist(), dtype=np.float64)
        sums = np.zeros((k, d))
        np.add.at(sums, cid, vs)
        counts = np.bincount(cid, weights=cnt, minlength=k)
        nonempty = counts > 0
        new = cents.copy()
        new[nonempty] = sums[nonempty] / counts[nonempty, None]
        cents = _normalize(new)
    return cents


class IVFAssign:
    def __init__(self, cent_ref):
        c = ray.get(cent_ref) if isinstance(cent_ref, ray.ObjectRef) else cent_ref
        self.centroids = c

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch))
        cid = np.argmax(m @ self.centroids.T, axis=1).astype(np.int32)
        return batch.append_column("centroid_id", pa.array(cid))


IVF_MANIFEST = "_ivf_manifest.json"
IVF_BUCKET_DIRNAME = "buckets"


def build_ivf_index(embeddings: "ray.data.Dataset", out_dir: str,
                    n_centroids: int = 16, seed: int = 7,
                    iters: int = 3) -> np.ndarray:
    """Persist the IVF index: seeded k-means centroids plus the corpus
    assignments written as hive-partitioned parquet
    (``partition_cols=["centroid_id"]``) — one directory per bucket.
    THIS is what makes IVF an index at 100 TB: a query probing
    ``nprobe`` buckets reads ~nprobe/n_centroids of the corpus bytes
    off storage (read-path pruning), instead of scanning everything and
    filtering after the read.

    Idempotent: when the manifest records the same (n_centroids, seed,
    iters), the persisted index is reused; otherwise the bucket dir is
    cleaned and rebuilt (stale-layout safety — same discipline as
    build_index's segment cleanup)."""
    os.makedirs(out_dir, exist_ok=True)
    man_path = os.path.join(out_dir, IVF_MANIFEST)
    cent_path = os.path.join(out_dir, "centroids.npy")
    bucket_dir = os.path.join(out_dir, IVF_BUCKET_DIRNAME)
    want = {"n_centroids": int(n_centroids), "seed": int(seed),
            "iters": int(iters)}
    if os.path.exists(man_path) and os.path.exists(cent_path):
        with open(man_path) as f:
            have = json.load(f)
        if have == want:
            return np.load(cent_path)
    shutil.rmtree(bucket_dir, ignore_errors=True)
    for p in (man_path, cent_path):
        if os.path.exists(p):
            os.remove(p)
    cents = ivf_centroids(embeddings, n_centroids, seed=seed, iters=iters)
    cent_ref = ray.put(cents)
    assigned = embeddings.map_batches(
        IVFAssign, fn_constructor_args=(cent_ref,), batch_format="pyarrow",
        zero_copy_batch=True, concurrency=(1, 8))
    assigned.write_parquet(bucket_dir, partition_cols=["centroid_id"])
    np.save(cent_path, cents)
    with open(man_path, "w") as f:
        json.dump(want, f)
    return cents


def ivf_probe_plan(cents: np.ndarray, query_matrix: np.ndarray,
                   nprobe: int) -> list[int]:
    """The union of each query's nprobe nearest centroid ids (sorted)."""
    qm = _normalize(np.asarray(query_matrix, dtype=np.float64))
    probe = np.argsort(-(qm @ cents.T), axis=1)[:, :nprobe]
    return sorted({int(c) for row in probe for c in row})


def ivf_probe_paths(index_dir: str, probe_set: list[int]) -> list[str]:
    """Parquet files under the probed centroids' bucket directories
    (missing dir = empty bucket, skipped).  Expanded to files because
    read_parquet takes a homogeneous file list; the pruning unit is
    still the bucket directory."""
    out: list[str] = []
    for c in probe_set:
        d = os.path.join(index_dir, IVF_BUCKET_DIRNAME, f"centroid_id={c}")
        if os.path.isdir(d):
            out.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                       if f.endswith(".parquet"))
    return out


def knn_ivf_indexed(index_dir: str, query_ids: list[int],
                    query_matrix: np.ndarray, k: int = 10,
                    nprobe: int = 4) -> pa.Table:
    """Approximate top-k against a persisted IVF index: plan the probe
    set from the (tiny) centroid matrix, then ``read_parquet`` ONLY the
    probed bucket directories — the scan is bounded by the probed
    buckets' bytes, never the corpus."""
    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    paths = ivf_probe_paths(index_dir,
                            ivf_probe_plan(cents, query_matrix, nprobe))
    if not paths:
        return pa.table(
            {"query_id": pa.array([], pa.int64()),
             "rank": pa.array([], pa.int32()),
             "vec_id": pa.array([], pa.int64()),
             "sim": pa.array([], pa.float64())})
    subset = ray.data.read_parquet(paths, columns=["vec_id", "embedding"])
    return knn_bruteforce(subset, query_ids, query_matrix, k)


def knn_ivf(embeddings: "ray.data.Dataset", query_ids: list[int],
            query_matrix: np.ndarray, k: int = 10, n_centroids: int = 16,
            nprobe: int = 4, index_dir: str | None = None) -> pa.Table:
    """Approximate top-k: probe only the nprobe nearest centroid buckets.
    Returns the same schema as knn_bruteforce.

    One-shot convenience over build_ivf_index + knn_ivf_indexed: builds
    (or, when ``index_dir`` is given and its manifest matches, reuses)
    the centroid-partitioned index, then probes it.  Callers issuing
    many query batches should build once and call knn_ivf_indexed."""
    import tempfile
    own_tmp = index_dir is None
    if own_tmp:
        index_dir = tempfile.mkdtemp(prefix="wse_ivf_")
    try:
        build_ivf_index(embeddings, index_dir, n_centroids=n_centroids)
        return knn_ivf_indexed(index_dir, query_ids, query_matrix,
                               k=k, nprobe=nprobe)
    finally:
        if own_tmp:
            shutil.rmtree(index_dir, ignore_errors=True)
