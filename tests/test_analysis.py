"""Training-data ops: dedup family, knn, text analysis, media plumbing."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from web_search_engine_ray.functions import textproc as tp


@pytest.fixture(scope="module")
def dup_corpus(tmp_path_factory):
    """Corpus with planted exact + near duplicates."""
    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "into the deep green forest tonight looking for food")
    texts = []
    for i in range(40):
        texts.append(f"unique document number {i} about topic {i * 7} "
                     f"with some filler words alpha beta {i}")
    texts.append(base)                          # 40
    texts.append(base)                          # 41 exact dup of 40
    texts.append(base.replace("tonight", "today"))      # 42 near dup
    texts.append(base.replace("quick", "slow") + " ok")  # 43 near dup
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    path = str(tmp_path_factory.mktemp("dup") / "docs.parquet")
    import pyarrow.parquet as pq
    pq.write_table(tbl, path)
    return tbl, path


def test_exact_dedup(ray_session, dup_corpus):
    from web_search_engine_ray.pipelines.analysis import exact_dedup
    tbl, path = dup_corpus
    out = exact_dedup(ray.data.from_arrow(tbl)).to_pandas()
    assert len(out) == tbl.num_rows - 1          # one exact dup collapsed
    kept = out.set_index("doc_id")["n_copies"]
    assert kept[40] == 2 and 41 not in kept.index


def test_minhash_near_dup(ray_session, dup_corpus):
    from web_search_engine_ray.pipelines.analysis import near_dup_pairs
    tbl, path = dup_corpus
    pairs = near_dup_pairs(ray.data.from_arrow(tbl), path, threshold=0.5) \
        .to_pandas()
    got = set(zip(pairs["doc_id_a"], pairs["doc_id_b"]))
    assert (40, 41) in got                       # exact dup -> jaccard 1.0
    assert (40, 42) in got and (41, 42) in got   # near dup found via LSH
    # unrelated docs never pair
    assert all(a >= 40 and b >= 40 for a, b in got)


def test_near_dup_no_driver_text_collection(ray_session, dup_corpus,
                                            monkeypatch):
    """Scale guard: near_dup_pairs must never collect document TEXTS to
    the driver (the pair verification and member expansion are hash
    joins in the object store).  Wraps Dataset.iter_batches and fails
    if any driver-collected batch carries a text column."""
    import ray.data
    from web_search_engine_ray.pipelines.analysis import near_dup_pairs
    tbl, path = dup_corpus
    orig = ray.data.Dataset.iter_batches

    def guarded(self, *args, **kwargs):
        for b in orig(self, *args, **kwargs):
            names = b.schema.names if isinstance(b, pa.Table) else \
                list(getattr(b, "columns", []))
            assert not any("text" in n for n in names), \
                f"driver-side text collection: {names}"
            yield b

    monkeypatch.setattr(ray.data.Dataset, "iter_batches", guarded)
    pairs = near_dup_pairs(ray.data.from_arrow(tbl), path,
                           threshold=0.5).to_pandas()
    got = set(zip(pairs["doc_id_a"], pairs["doc_id_b"]))
    assert (40, 41) in got and (40, 42) in got


def test_exact_jaccard_bounds():
    assert tp.exact_jaccard("a b c d e", "a b c d e") == 1.0
    assert tp.exact_jaccard("a b c d e", "x y z w v") == 0.0


def test_simhash_near_dup(ray_session, dup_corpus):
    from web_search_engine_ray.pipelines.analysis import simhash_pairs
    tbl, path = dup_corpus
    pairs = simhash_pairs(ray.data.from_arrow(tbl), max_hamming=6).to_pandas()
    got = set(zip(pairs["doc_id_a"], pairs["doc_id_b"]))
    assert (40, 41) in got                       # identical -> hamming 0
    ham = dict(zip(zip(pairs["doc_id_a"], pairs["doc_id_b"]), pairs["hamming"]))
    assert ham[(40, 41)] == 0


def test_simhash_deterministic():
    t = "some stable text for hashing determinism"
    assert tp.simhash64(t) == tp.simhash64(t)
    assert tp.hamming64(tp.simhash64(t), tp.simhash64(t)) == 0
    near = tp.simhash64(t.replace("stable", "stably"))
    assert tp.hamming64(tp.simhash64(t), near) <= 16


def test_minhash_est_accuracy():
    h = tp.FastMinHasher(256)
    a = tp.shingle_hashes(" ".join(f"w{i}" for i in range(100)), 3)
    b = tp.shingle_hashes(" ".join(f"w{i}" for i in range(50, 150)), 3)
    true_j = len(set(a.tolist()) & set(b.tolist())) / len(set(a.tolist()) | set(b.tolist()))
    est = tp.est_jaccard(h.signature(a), h.signature(b))
    assert abs(true_j - est) < 0.12


def test_lang_id():
    en = "the cat is on the mat and it was not happy with that"
    de = "der hund ist nicht in dem haus und das ist auch gut so"
    fr = "le chat est dans la maison et il ne veut pas sortir pour vous"
    assert tp.lang_id(en)[0] == "en"
    assert tp.lang_id(de)[0] == "de"
    assert tp.lang_id(fr)[0] == "fr"
    assert tp.lang_id("")[0] == "und"


def test_quality_features():
    nt, nc, sr, pr, mt = tp.quality_features("The cat, the dog!")
    assert nt == 4 and nc == 17
    assert sr == 0.5          # "the" twice out of 4 tokens
    assert pr == 2 / 17


def test_knn_bruteforce_vs_numpy(ray_session):
    rng = np.random.default_rng(3)
    n, d = 300, 16
    mat = rng.normal(size=(n, d)).astype(np.float32)
    tbl = pa.table({"vec_id": pa.array(range(n), pa.int64()),
                    "embedding": pa.array([row.tolist() for row in mat],
                                          pa.list_(pa.float32()))})
    from web_search_engine_ray.pipelines.knn import _normalize, knn_bruteforce
    q = mat[:3].astype(np.float64)
    res = knn_bruteforce(ray.data.from_arrow(tbl), [0, 1, 2], q, k=5).to_pandas()
    # numpy reference
    nm = _normalize(mat.astype(np.float64))
    nq = _normalize(q)
    sims = nm @ nq.T
    for qi in range(3):
        want = np.lexsort((np.arange(n), -sims[:, qi]))[:5]
        got = res[res["query_id"] == qi]["vec_id"].to_numpy()
        assert (got == want).all()
        assert res[res["query_id"] == qi]["rank"].tolist() == [1, 2, 3, 4, 5]


def test_knn_ivf_recall_synthetic(ray_session):
    rng = np.random.default_rng(5)
    n, d = 400, 8
    centers = rng.normal(size=(8, d)) * 4
    mat = (centers[rng.integers(0, 8, size=n)]
           + rng.normal(size=(n, d))).astype(np.float32)
    tbl = pa.table({"vec_id": pa.array(range(n), pa.int64()),
                    "embedding": pa.array([r.tolist() for r in mat],
                                          pa.list_(pa.float32()))})
    from web_search_engine_ray.pipelines.knn import knn_bruteforce, knn_ivf
    q = mat[:2].astype(np.float64)
    ds = ray.data.from_arrow(tbl)
    exact = knn_bruteforce(ds, [0, 1], q, k=10).to_pandas()
    approx = knn_ivf(ds, [0, 1], q, k=10, n_centroids=8, nprobe=4).to_pandas()
    recalls = []
    for qi in (0, 1):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6  # probing half the clustered space


def test_media_plumbing(ray_session):
    from web_search_engine_ray.stages.media import (FakeDecoder,
                                                    MediaFeatureStage)
    payloads = [bytes([i]) * (10 + i) for i in range(20)]
    tbl = pa.table({
        "media_id": pa.array(range(20), pa.int64()),
        "kind": pa.array(["image"] * 10 + ["video"] * 10, pa.string()),
        "payload": pa.array(payloads, pa.large_binary()),
        "mime": pa.array(["x"] * 20, pa.string())})
    out = ray.data.from_arrow(tbl).map_batches(
        MediaFeatureStage, batch_format="pyarrow", batch_size=4,
        concurrency=2).to_pandas().sort_values("media_id")
    assert len(out) == 20
    assert (out[out["kind"] == "image"]["n_frames"] == 1).all()
    # deterministic: same payload -> same features
    w, h, nf, fv = FakeDecoder().decode(payloads[0], "image")
    assert out.iloc[0]["width"] == w and out.iloc[0]["height"] == h

    # real decoders are gated, not silently fake
    import pytest as _pytest
    from web_search_engine_ray.stages.media import ImageDecoder
    with _pytest.raises(NotImplementedError):
        ImageDecoder().decode(b"x", "image")


def test_knn_ivf_recall(ray_session):
    """IVF (k-means centroids, nprobe=4) must reach recall@10 >= 0.9 vs
    brute force on the sf0.01 embeddings, deterministically."""
    import os
    import pyarrow.parquet as pq
    import ray.data
    from web_search_engine_ray.pipelines.knn import (_batch_matrix,
                                                     knn_bruteforce, knn_ivf)
    emb_path = "/root/testdata/sf0.01/embeddings.parquet"
    if not os.path.exists(emb_path):
        pytest.skip("testdata missing")
    qtbl = pq.read_table(emb_path, filters=[("vec_id", "in", [0, 1, 2, 3, 4])])
    order = np.argsort(qtbl.column("vec_id").to_numpy())
    qmat = _batch_matrix(qtbl)[order]
    ds = ray.data.read_parquet(emb_path, columns=["vec_id", "embedding"])
    exact = knn_bruteforce(ds, [0, 1, 2, 3, 4], qmat, k=10).to_pandas()
    approx = knn_ivf(ds, [0, 1, 2, 3, 4], qmat, k=10).to_pandas()
    approx2 = knn_ivf(ds, [0, 1, 2, 3, 4], qmat, k=10).to_pandas()
    assert approx.equals(approx2)                  # deterministic
    recalls = []
    for qid in exact.query_id.unique():
        e = set(exact[exact.query_id == qid].vec_id)
        a = set(approx[approx.query_id == qid].vec_id)
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.9, recalls


def test_embedding_dup_ann_vs_exact(ray_session):
    """IVF-bucketed approximate near-dup pairs: subset of the exact
    pairs with high recall on the sf0.01 embeddings."""
    import os
    import ray.data
    from web_search_engine_ray.pipelines.analysis import (
        embedding_dup_pairs, embedding_dup_pairs_ann)
    emb_path = "/root/testdata/sf0.01/embeddings.parquet"
    if not os.path.exists(emb_path):
        pytest.skip("testdata missing")
    ds = ray.data.read_parquet(emb_path, columns=["vec_id", "embedding"])
    exact = embedding_dup_pairs(ds, threshold=0.45).to_pandas()
    ann = embedding_dup_pairs_ann(ds, threshold=0.45).to_pandas()
    e = set(zip(exact.vec_id_a, exact.vec_id_b))
    a = set(zip(ann.vec_id_a, ann.vec_id_b))
    assert a <= e                                  # no false positives
    assert len(e) == 0 or len(a & e) / len(e) >= 0.9


def test_embedding_dup_chunked_matches_single_chunk(ray_session):
    """The block-pair decomposition is exact: tiny chunk size (forcing
    many chunk pairs) must reproduce the single-chunk result."""
    import ray.data
    from web_search_engine_ray.pipelines.analysis import embedding_dup_pairs
    g = np.random.Generator(np.random.PCG64(5))
    base = g.normal(size=(40, 8))
    base[25] = base[24] + 0.01 * g.normal(size=8)   # planted near-dup
    base[33] = base[32] + 0.01 * g.normal(size=8)
    tbl = pa.table({"vec_id": pa.array(range(40), pa.int64()),
                    "embedding": pa.array([r.tolist() for r in base],
                                          pa.list_(pa.float64()))})
    one = embedding_dup_pairs(ray.data.from_arrow(tbl), 0.9,
                              chunk_rows=4096).to_pandas()
    many = embedding_dup_pairs(ray.data.from_arrow(tbl), 0.9,
                               chunk_rows=7).to_pandas()
    assert one.equals(many)
    got = set(zip(one.vec_id_a, one.vec_id_b))
    assert (24, 25) in got and (32, 33) in got


def test_group_topk(ray_session):
    import ray.data
    from web_search_engine_ray.pipelines.window import group_topk
    tbl = pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        "grp": pa.array(["a", "a", "a", "a", "b", "b", "c", "c", "c", "c"]),
        "score": pa.array([5, 9, 9, 1, 3, 3, 7, 7, 7, 2], pa.int64())})
    out = group_topk(ray.data.from_arrow(tbl), key="grp",
                     order_col="score", k=2, id_col="doc_id").to_pandas()
    # no tie-break column at all -> clear error, not StopIteration
    two_col = pa.table({"grp": pa.array(["a"]), "score": pa.array([1])})
    with pytest.raises(ValueError, match="tie-break"):
        group_topk(ray.data.from_arrow(two_col), key="grp",
                   order_col="score", k=1)
    # ties break by doc_id ascending
    got = list(zip(out["grp"], out["rank"], out["doc_id"]))
    assert got == [("a", 1, 1), ("a", 2, 2),
                   ("b", 1, 4), ("b", 2, 5),
                   ("c", 1, 6), ("c", 2, 7)]


def test_tumbling_window_agg(ray_session):
    import ray.data
    from web_search_engine_ray.pipelines.window import tumbling_window_agg
    h = 3_600_000_000
    ts = np.array([0, h // 2, h, h + 1, 3 * h], dtype="int64")
    tbl = pa.table({
        "k": pa.array(["x", "x", "x", "y", "y"]),
        "ts": pa.array(ts, pa.timestamp("us")),
        "v": pa.array([1.0, 2.0, 4.0, 8.0, 16.0], pa.float64())})
    out = tumbling_window_agg(ray.data.from_arrow(tbl), "k", "ts", "v",
                              h).to_pandas()
    rows = {(r.k, r.window_start.value // 1000): (r.n_events, r.total_value)
            for r in out.itertuples()}
    assert rows == {("x", 0): (2, 3.0), ("x", h): (1, 4.0),
                    ("y", h): (1, 8.0), ("y", 3 * h): (1, 16.0)}


def _make_bmp(w, h, fill=0x40):
    import struct
    row = ((w * 3 + 3) // 4) * 4          # 24bpp rows pad to 4 bytes
    pix = bytes([fill]) * (row * h)
    header = (b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(pix), 2835, 2835, 0, 0))
    return header + pix


def _make_wav(channels, bits, n_frames, rate=8000):
    import struct
    block = channels * bits // 8
    data = bytes(n_frames * block)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block,
                      block, bits)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_real_media_decoders(ray_session):
    """BMP/WAV decode for real (pure stdlib) through the actor-pool
    stage — the multimodal plumbing is no longer stub-only."""
    import ray.data
    from web_search_engine_ray.stages.media import (BmpDecoder,
                                                    MediaFeatureStage,
                                                    WavDecoder)
    w, h = BmpDecoder().decode(_make_bmp(17, 9), "image")[:2]
    assert (w, h) == (17, 9)
    ch, bits, nfr, feats = WavDecoder().decode(_make_wav(2, 16, 1000), "audio")
    assert (ch, bits, nfr) == (2, 16, 1000)
    assert len(feats) == 16 and abs(float(feats.sum()) - 1.0) < 1e-5

    tbl = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "kind": pa.array(["image", "image"], pa.string()),
        "payload": pa.array([_make_bmp(4, 3), _make_bmp(8, 2)],
                            pa.large_binary()),
        "mime": pa.array(["image/bmp"] * 2, pa.string())})
    out = ray.data.from_arrow(tbl).map_batches(
        MediaFeatureStage, fn_constructor_args=(BmpDecoder(),),
        batch_format="pyarrow", batch_size=2, concurrency=1).to_pandas()
    assert list(out.width) == [4, 8] and list(out.height) == [3, 2]


def test_ivf_probe_reads_only_probed_partitions(ray_session, tmp_path,
                                                monkeypatch):
    """Round-4 verdict #3: the IVF probe must be read-path pruning — the
    parquet scan touches ONLY the probed centroid_id=... bucket dirs,
    a strict subset of the corpus bytes (that is what makes it an
    index).  Spy on read_parquet to capture the exact paths read."""
    import os
    import ray.data
    from web_search_engine_ray.pipelines import knn

    rng = np.random.default_rng(11)
    n, d = 600, 8
    centers = rng.normal(size=(8, d)) * 4
    mat = (centers[rng.integers(0, 8, size=n)]
           + rng.normal(size=(n, d))).astype(np.float32)
    tbl = pa.table({"vec_id": pa.array(range(n), pa.int64()),
                    "embedding": pa.array([r.tolist() for r in mat],
                                          pa.list_(pa.float32()))})
    idx = str(tmp_path / "ivf")
    cents = knn.build_ivf_index(ray.data.from_arrow(tbl), idx,
                                n_centroids=8)
    assert cents.shape == (8, d)
    all_dirs = sorted(os.listdir(os.path.join(idx, "buckets")))
    assert all(p.startswith("centroid_id=") for p in all_dirs)

    captured = {}
    real = ray.data.read_parquet

    def spy(paths, **kw):
        captured["paths"] = paths
        return real(paths, **kw)

    monkeypatch.setattr(knn.ray.data, "read_parquet", spy)
    q = mat[:2].astype(np.float64)
    out = knn.knn_ivf_indexed(idx, [0, 1], q, k=10, nprobe=2)
    assert out.num_rows == 20
    paths = captured["paths"]
    probed_dirs = {os.path.dirname(p) for p in paths}
    # union over 2 queries x nprobe=2 -> at most 4 of the 8 buckets
    assert 1 <= len(probed_dirs) <= 4 < len(all_dirs)
    assert all(os.path.basename(d).startswith("centroid_id=")
               for d in probed_dirs)

    def _bytes(root):
        return sum(os.path.getsize(os.path.join(dp, f))
                   for dp, _, fs in os.walk(root) for f in fs)

    probed = sum(_bytes(d) for d in probed_dirs)
    total = _bytes(os.path.join(idx, "buckets"))
    assert probed < total  # strictly fewer corpus bytes than a full scan

    # idempotent reuse: same manifest -> no rebuild, same centroids
    again = knn.build_ivf_index(ray.data.from_arrow(tbl), idx,
                                n_centroids=8)
    assert np.array_equal(cents, again)


def test_simhash_identical_mass_collapses_before_pairing(
        ray_session, monkeypatch):
    """Round-4 verdict #4: docs with IDENTICAL simhash (the dominant
    near-dup mass) must be collapsed to one representative before the
    quadratic distinct-hash pairing.  Plant a hot bucket of 200
    identical docs with the distinct-hash guard clamped to 2 — the run
    only survives if pairing sees 1 representative, not 200 rows."""
    from web_search_engine_ray.pipelines import analysis

    monkeypatch.setattr(analysis, "_SIMHASH_MAX_DISTINCT_PER_BUCKET", 2)
    n = 200
    texts = ["identical hot duplicate text payload"] * n
    tbl = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = analysis.simhash_pairs(ray.data.from_arrow(tbl),
                                 max_hamming=3).to_pandas()
    assert len(out) == n * (n - 1) // 2          # all pairs, hamming 0
    assert (out.hamming == 0).all()
    assert (out.doc_id_a < out.doc_id_b).all()


def test_simhash_distinct_hash_guard_fires(ray_session, monkeypatch):
    """A bucket holding more DISTINCT simhashes than the bound must
    refuse loudly (with salting guidance) instead of running O(U^2)."""
    import pytest as _pytest
    from web_search_engine_ray.functions import textproc as tp
    from web_search_engine_ray.pipelines import analysis

    base = ("stable common tokens repeated across every doc body " * 4)
    texts = [base + f"variant{i}" for i in range(8)]
    hs = tp.simhash64_batch(texts).astype(np.uint64)
    # precondition: some 16-bit band bucket holds > 2 distinct hashes
    buckets = {}
    for h in hs:
        for b in range(4):
            key = (b, int((h >> np.uint64(16 * b)) & np.uint64(0xFFFF)))
            buckets.setdefault(key, set()).add(int(h))
    assert max(len(v) for v in buckets.values()) > 2, \
        "fixture no longer collides; adjust texts"
    monkeypatch.setattr(analysis, "_SIMHASH_MAX_DISTINCT_PER_BUCKET", 2)
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    with _pytest.raises((RuntimeError, ray.exceptions.RayTaskError),
                        match="DISTINCT simhashes"):
        analysis.simhash_pairs(ray.data.from_arrow(tbl), max_hamming=3)
