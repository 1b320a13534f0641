"""Product quantization (PQ) for embedding columns — the compression
leg of the ANN scale path (Jégou, Douze, Schmid, "Product Quantization
for Nearest Neighbor Search", TPAMI 2011).

At 100 TB an embedding corpus cannot be scanned as float32: PQ stores
each d-dim vector as M uint8 codes (one per d/M-dim subspace, each
quantized against its own K-entry codebook), a 4*d/M-fold compression
(64-dim float32 -> 8 bytes at M=8).  Queries score compressed codes via
ADC (asymmetric distance computation): one K×M lookup table of
query-subvector · codeword dot products per query, then a vectorized
gather-sum over the code matrix — no decompression, no float corpus.

Distributed shapes (all corpus-pass, driver state O(M·K·d/M) = O(K·d)):

- ``train_pq_codebooks`` — per-subspace Lloyd iterations run in ONE
  map_batches pass per iteration (each batch emits per-(subspace,
  code) partial sums/counts; the driver combines K·M rows per block).
  Spherical pipeline: vectors are L2-normalized first (similarity is
  cosine everywhere in this repo), codebooks quantize the normalized
  residual space with plain L2 nearest-codeword assignment.
- ``pq_encode`` — stateless map_batches: Dataset (vec_id, code_0..)
  -> parquet-friendly fixed-width uint8 columns.
- ``knn_pq_adc`` — broadcast (codebooks, query matrix) once via
  ray.put; each batch gathers LUT[code] sums and emits its local top-k
  candidates (k rows per query per block); driver merges.  Approximate
  by construction — pinned by a recall@k test against knn_bruteforce,
  not a hash oracle (same treatment as knn_ivf).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from web_search_engine_ray.pipelines.knn import (_batch_matrix, _normalize,
                                                 _merge_topk_factory)
from web_search_engine_ray.spec import derive_seed


def train_pq_codebooks(embeddings: "ray.data.Dataset", dim: int,
                       n_subspaces: int = 16, n_codes: int = 256,
                       seed: int = 7, iters: int = 6,
                       normalize: bool = True) -> np.ndarray:
    """Train per-subspace codebooks; returns float64[M, K, d/M].

    Init: seeded vec_id sample (deterministic across cluster layouts);
    each Lloyd iteration is one corpus pass emitting per-(subspace,
    code) partial sums — M·K rows per block, corpus never collected."""
    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by M={n_subspaces}")
    ds_sub = dim // n_subspaces
    n = embeddings.count()
    if n == 0:
        raise ValueError("cannot train PQ codebooks on an empty corpus")
    g = np.random.Generator(np.random.PCG64(derive_seed(seed, "pq")))
    ids = sorted(g.choice(n, size=min(n_codes, n),
                          replace=False).tolist())
    sample = embeddings.filter(expr=f"vec_id in {ids}")
    tbl = pa.concat_tables(list(sample.iter_batches(batch_format="pyarrow")))
    order = np.argsort(tbl.column("vec_id").to_numpy())
    init = _batch_matrix(tbl)[order]                  # [K, dim]
    if normalize:
        init = _normalize(init)
    K = init.shape[0]
    # books[m] initialized from the same sample's m-th subvectors
    books = np.stack([init[:, m * ds_sub:(m + 1) * ds_sub]
                      for m in range(n_subspaces)])   # [M, K, ds]
    M = n_subspaces

    for _ in range(iters):
        book_ref = ray.put(books)

        def partial(batch: pa.Table) -> pa.Table:
            bks = ray.get(book_ref)
            x = _batch_matrix(batch)                  # [n, dim]
            if normalize:
                x = _normalize(x)
            out_m, out_c, out_s, out_n = [], [], [], []
            for m in range(M):
                sub = x[:, m * ds_sub:(m + 1) * ds_sub]
                # L2 argmin == argmax(2 x·c - |c|^2)
                sc = 2.0 * (sub @ bks[m].T) - (bks[m] ** 2).sum(1)
                cid = np.argmax(sc, axis=1)
                sums = np.zeros((K, ds_sub))
                np.add.at(sums, cid, sub)
                cnt = np.bincount(cid, minlength=K).astype(np.int64)
                out_m.append(np.full(K, m, np.int32))
                out_c.append(np.arange(K, dtype=np.int32))
                out_s.append(sums)
                out_n.append(cnt)
            return pa.table({
                "m": pa.array(np.concatenate(out_m), pa.int32()),
                "cid": pa.array(np.concatenate(out_c), pa.int32()),
                "vsum": pa.array(list(np.concatenate(out_s)),
                                 pa.list_(pa.float64())),
                "cnt": pa.array(np.concatenate(out_n), pa.int64())})

        parts = pa.concat_tables(list(
            embeddings.select_columns(["vec_id", "embedding"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .iter_batches(batch_format="pyarrow")))
        mm = parts.column("m").to_numpy()
        cc = parts.column("cid").to_numpy()
        cnt = parts.column("cnt").to_numpy()
        vs = np.asarray(parts.column("vsum").to_pylist(), np.float64)
        sums = np.zeros((M, K, ds_sub))
        counts = np.zeros((M, K))
        np.add.at(sums, (mm, cc), vs)
        np.add.at(counts, (mm, cc), cnt)
        nonempty = counts > 0
        books = books.copy()
        books[nonempty] = sums[nonempty] / counts[nonempty][:, None]
    return books


def pq_encode(embeddings: "ray.data.Dataset", books: np.ndarray,
              normalize: bool = True) -> "ray.data.Dataset":
    """Encode to (vec_id, code_0..code_{M-1}) uint8 columns — a flat,
    parquet/partition-friendly layout (fixed-width, no nesting)."""
    M, K, ds_sub = books.shape
    if K > 256:
        raise ValueError("uint8 codes require n_codes <= 256")
    book_ref = ray.put(books)

    def _enc(batch: pa.Table) -> pa.Table:
        bks = ray.get(book_ref)
        x = _batch_matrix(batch)
        if normalize:
            x = _normalize(x)
        cols = {"vec_id": batch.column("vec_id")}
        for m in range(M):
            sub = x[:, m * ds_sub:(m + 1) * ds_sub]
            sc = 2.0 * (sub @ bks[m].T) - (bks[m] ** 2).sum(1)
            cols[f"code_{m}"] = pa.array(
                np.argmax(sc, axis=1).astype(np.uint8), pa.uint8())
        return pa.table(cols)

    return embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        _enc, batch_format="pyarrow", zero_copy_batch=True)


def pq_reconstruction_mse(embeddings: "ray.data.Dataset",
                          books: np.ndarray) -> float:
    """Mean squared reconstruction error over the (normalized) corpus —
    streaming partials, one scalar per block to the driver."""
    M, K, ds_sub = books.shape
    book_ref = ray.put(books)

    def _err(batch: pa.Table) -> pa.Table:
        bks = ray.get(book_ref)
        x = _normalize(_batch_matrix(batch))
        se = 0.0
        for m in range(M):
            sub = x[:, m * ds_sub:(m + 1) * ds_sub]
            sc = 2.0 * (sub @ bks[m].T) - (bks[m] ** 2).sum(1)
            cid = np.argmax(sc, axis=1)
            se += float(((sub - bks[m][cid]) ** 2).sum())
        return pa.table({"se": pa.array([se], pa.float64()),
                         "n": pa.array([len(x)], pa.int64())})

    tot_se, tot_n = 0.0, 0
    for t in embeddings.select_columns(["vec_id", "embedding"]).map_batches(
            _err, batch_format="pyarrow", zero_copy_batch=True
            ).iter_batches(batch_format="pyarrow", batch_size=None):
        tot_se += float(np.sum(t.column("se").to_numpy()))
        tot_n += int(np.sum(t.column("n").to_numpy()))
    return tot_se / max(tot_n, 1)


class _ADCScorer:
    """Actor-pool stage: LUTs built once per actor, per batch one
    gather-sum over the uint8 code matrix + local top-k."""

    def __init__(self, ref, k: int):
        payload = ray.get(ref)
        self.books = payload["books"]                 # [M, K, ds]
        q = _normalize(payload["matrix"])             # [Q, dim]
        self.query_id = payload["query_id"]
        M, K, ds_sub = self.books.shape
        # LUT[q, m, c] = q_sub(m) · codeword(m, c)
        self.lut = np.einsum("qmd,mkd->qmk",
                             q.reshape(len(q), M, ds_sub), self.books)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        M = self.books.shape[0]
        codes = np.stack([batch.column(f"code_{m}").to_numpy()
                          for m in range(M)], axis=1)   # [n, M]
        vec_id = batch.column("vec_id").to_numpy()
        n, Q = len(vec_id), len(self.query_id)
        # sims[q, i] = sum_m LUT[q, m, codes[i, m]] — one gather per
        # subspace, no per-row loop
        sims = np.stack([self.lut[:, m, codes[:, m]]
                         for m in range(M)]).sum(0)      # [Q, n]
        k = min(self.k, n)
        out_q, out_v, out_s = [], [], []
        for qi in range(Q):
            s = sims[qi]
            idx = np.argpartition(-s, k - 1)[:k] if n > k else \
                np.arange(n)
            out_q.append(np.full(k, self.query_id[qi], np.int64))
            out_v.append(vec_id[idx])
            out_s.append(s[idx])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
            "sim": pa.array(np.concatenate(out_s), pa.float64())})


def knn_pq_adc(codes_ds: "ray.data.Dataset", books: np.ndarray,
               query_ids: list[int], query_matrix: np.ndarray,
               k: int = 10) -> pa.Table:
    """Approximate cosine top-k over PQ codes via ADC; same output shape
    as knn_bruteforce (query_id, rank, vec_id, sim), ties by vec_id."""
    ref = ray.put({"books": books,
                   "query_id": np.asarray(query_ids, np.int64),
                   "matrix": query_matrix})
    partials = codes_ds.map_batches(
        _ADCScorer, fn_constructor_args=(ref, k),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=4096,
        concurrency=(1, 8))
    merged = partials.groupby("query_id").map_groups(
        _merge_topk_factory(k), batch_format="pyarrow")
    batches = list(merged.iter_batches(batch_format="pyarrow"))
    tbl = pa.concat_tables(batches) if batches else pa.table(
        {"query_id": pa.array([], pa.int64()),
         "rank": pa.array([], pa.int32()),
         "vec_id": pa.array([], pa.int64()),
         "sim": pa.array([], pa.float64())})
    return tbl.sort_by([("query_id", "ascending"), ("rank", "ascending")])


# --- IVF + PQ (IVFADC) -----------------------------------------------------

IVFPQ_MANIFEST = "_ivfpq_manifest.json"


def build_ivfpq_index(embeddings: "ray.data.Dataset", out_dir: str,
                      n_centroids: int = 16, n_subspaces: int = 16,
                      n_codes: int = 256, seed: int = 7,
                      iters: int = 3, pq_iters: int = 6,
                      dim: int | None = None) -> None:
    """Persist the full IVFADC layout (Jégou et al. §IV): coarse
    k-means centroids partition the corpus into hive bucket dirs
    (read-path pruning, as in knn.build_ivf_index) and each vector is
    stored as M uint8 PQ codes of its RESIDUAL (x - centroid) — the
    probed buckets are both few (nprobe/n_centroids of storage) and
    small (16x narrower than float32).  x ≈ c + decode(codes), so
    q·x ≈ q·c + Σ_m LUT[m, code_m].

    One pass trains the coarse quantizer (knn.ivf_centroids), one
    builds the residual dataset for PQ training, and ONE final pass
    assigns + encodes + writes (partition_cols=["centroid_id"]).
    Idempotent via a config manifest (same discipline as
    build_ivf_index)."""
    import json
    import os
    import shutil

    from web_search_engine_ray.pipelines.knn import (IVF_BUCKET_DIRNAME,
                                                     ivf_centroids)
    os.makedirs(out_dir, exist_ok=True)
    man_path = os.path.join(out_dir, IVFPQ_MANIFEST)
    want = {"n_centroids": int(n_centroids), "M": int(n_subspaces),
            "K": int(n_codes), "seed": int(seed), "iters": int(iters),
            "pq_iters": int(pq_iters)}
    if os.path.exists(man_path):
        with open(man_path) as f:
            if json.load(f) == want:
                return
    bucket_dir = os.path.join(out_dir, IVF_BUCKET_DIRNAME)
    shutil.rmtree(bucket_dir, ignore_errors=True)
    for p in (man_path, os.path.join(out_dir, "centroids.npy"),
              os.path.join(out_dir, "books.npy")):
        if os.path.exists(p):
            os.remove(p)

    cents = ivf_centroids(embeddings, n_centroids, seed=seed, iters=iters)
    if dim is None:
        dim = cents.shape[1]
    cent_ref = ray.put(cents)

    def _residual(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        x = _normalize(_batch_matrix(batch))
        cid = np.argmax(x @ c.T, axis=1)
        r = x - c[cid]
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "embedding": pa.array(list(r.astype(np.float32)),
                                  pa.list_(pa.float32()))})

    residuals = embeddings.select_columns(["vec_id", "embedding"]) \
        .map_batches(_residual, batch_format="pyarrow",
                     zero_copy_batch=True)
    books = train_pq_codebooks(residuals, dim=dim,
                               n_subspaces=n_subspaces, n_codes=n_codes,
                               seed=seed, iters=pq_iters, normalize=False)
    book_ref = ray.put(books)
    M, K, ds_sub = books.shape

    def _assign_encode(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        bks = ray.get(book_ref)
        x = _normalize(_batch_matrix(batch))
        cid = np.argmax(x @ c.T, axis=1)
        r = x - c[cid]
        cols = {"vec_id": batch.column("vec_id")}
        for m in range(M):
            sub = r[:, m * ds_sub:(m + 1) * ds_sub]
            sc = 2.0 * (sub @ bks[m].T) - (bks[m] ** 2).sum(1)
            cols[f"code_{m}"] = pa.array(
                np.argmax(sc, axis=1).astype(np.uint8), pa.uint8())
        # cid duplicated as a data column: the hive partition col
        # (centroid_id) lives only in the path and is not readable from
        # an explicit file list
        cols["cid"] = pa.array(cid.astype(np.int32), pa.int32())
        cols["centroid_id"] = pa.array(cid.astype(np.int32), pa.int32())
        return pa.table(cols)

    embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        _assign_encode, batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(bucket_dir, partition_cols=["centroid_id"])
    np.save(os.path.join(out_dir, "centroids.npy"), cents)
    np.save(os.path.join(out_dir, "books.npy"), books)
    with open(man_path, "w") as f:
        json.dump(want, f)


class _IVFADCScorer:
    """Per batch: sims = q·centroid[cid] + Σ_m LUT[q, m, code_m] —
    one gather per subspace plus one centroid-dot gather."""

    def __init__(self, ref, k: int):
        p = ray.get(ref)
        self.cents, self.books = p["cents"], p["books"]
        q = _normalize(p["matrix"])
        self.query_id = p["query_id"]
        M, K, ds_sub = self.books.shape
        self.lut = np.einsum("qmd,mkd->qmk",
                             q.reshape(len(q), M, ds_sub), self.books)
        self.qc = q @ self.cents.T                     # [Q, n_centroids]
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        M = self.books.shape[0]
        codes = np.stack([batch.column(f"code_{m}").to_numpy()
                          for m in range(M)], axis=1)
        cid = np.asarray(batch.column("cid").to_numpy(
            zero_copy_only=False), np.int64)
        vec_id = batch.column("vec_id").to_numpy()
        n = len(vec_id)
        sims = np.stack([self.lut[:, m, codes[:, m]]
                         for m in range(M)]).sum(0) + self.qc[:, cid]
        k = min(self.k, n)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(self.query_id)):
            s = sims[qi]
            idx = np.argpartition(-s, k - 1)[:k] if n > k else np.arange(n)
            out_q.append(np.full(len(idx), self.query_id[qi], np.int64))
            out_v.append(vec_id[idx])
            out_s.append(s[idx])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
            "sim": pa.array(np.concatenate(out_s), pa.float64())})


def knn_ivfpq_indexed(index_dir: str, query_ids: list[int],
                      query_matrix: np.ndarray, k: int = 10,
                      nprobe: int = 4) -> pa.Table:
    """Approximate top-k against a persisted IVFADC index: plan probes
    from the tiny centroid matrix, read ONLY the probed bucket dirs
    (and only the uint8 code columns — 16x narrower than the float
    corpus), score via residual-ADC, merge per-block top-k."""
    import os

    from web_search_engine_ray.pipelines.knn import (ivf_probe_paths,
                                                     ivf_probe_plan)
    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    books = np.load(os.path.join(index_dir, "books.npy"))
    M = books.shape[0]
    paths = ivf_probe_paths(index_dir,
                            ivf_probe_plan(cents, query_matrix, nprobe))
    empty = pa.table(
        {"query_id": pa.array([], pa.int64()),
         "rank": pa.array([], pa.int32()),
         "vec_id": pa.array([], pa.int64()),
         "sim": pa.array([], pa.float64())})
    if not paths:
        return empty
    ref = ray.put({"cents": cents, "books": books,
                   "query_id": np.asarray(query_ids, np.int64),
                   "matrix": query_matrix})
    subset = ray.data.read_parquet(
        paths, columns=["vec_id", "cid"]
        + [f"code_{m}" for m in range(M)])
    partials = subset.map_batches(
        _IVFADCScorer, fn_constructor_args=(ref, k),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=4096,
        concurrency=(1, 8))
    merged = partials.groupby("query_id").map_groups(
        _merge_topk_factory(k), batch_format="pyarrow")
    batches = list(merged.iter_batches(batch_format="pyarrow"))
    tbl = pa.concat_tables(batches) if batches else empty
    return tbl.sort_by([("query_id", "ascending"), ("rank", "ascending")])
