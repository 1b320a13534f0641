"""label_centroids (pipelines/vectors.py) vs numpy ground truth."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from web_search_engine_ray.pipelines.vectors import label_centroids


def _emb(seed=71, n=600, d=16, n_labels=5):
    g = np.random.default_rng(seed)
    labels = g.integers(0, n_labels, n).astype(np.int64)
    mat = g.normal(0, 1, (n, d))
    t = pa.table({
        "label": pa.array(labels, pa.int32()),   # int32 like testdata
        "embedding": pa.array(list(mat.astype(np.float32))),
    })
    return t, labels, mat.astype(np.float32).astype(np.float64)


def test_centroids_match_numpy(ray_session):
    t, labels, mat = _emb()
    got = label_centroids(ray.data.from_arrow(t).repartition(7),
                          "label", "embedding")
    d = mat.shape[1]
    assert got.num_rows == len(np.unique(labels)) * d
    for lb in np.unique(labels):
        want = np.round(mat[labels == lb].mean(axis=0), 6)
        sub = got.filter(pa.compute.equal(got.column("label"), int(lb)))
        assert sub.column("ord").to_pylist() == list(range(1, d + 1))
        np.testing.assert_allclose(sub.column("v").to_numpy(), want,
                                   atol=1.1e-6)


def test_centroids_partition_invariant(ray_session):
    t, _, _ = _emb(seed=72, n=200)
    a = label_centroids(ray.data.from_arrow(t), "label", "embedding")
    b = label_centroids(ray.data.from_arrow(t).repartition(11),
                        "label", "embedding")
    assert a.column("label").to_pylist() == b.column("label").to_pylist()
    np.testing.assert_allclose(a.column("v").to_numpy(),
                               b.column("v").to_numpy(), atol=2e-6)


def test_centroids_ragged_rejected(ray_session):
    t = pa.table({"label": pa.array([0, 1], pa.int64()),
                  "embedding": pa.array([[1.0, 2.0], [1.0]])})
    with pytest.raises(Exception):
        label_centroids(ray.data.from_arrow(t), "label", "embedding")
