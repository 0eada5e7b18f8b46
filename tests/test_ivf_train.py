"""IVF codebook training: deterministic, unit-norm, cache-independent."""

import numpy as np

from ferret_spark import pipeline as P

SF_DIR = "/root/testdata/sf0.001"


def test_trained_centroids_deterministic():
    c1 = P.ivf_trained_centroids(SF_DIR)
    P._IVF_TRAIN_CACHE.clear()
    c2 = P.ivf_trained_centroids(SF_DIR)
    assert c1 == c2  # bit-identical across cold calls (same process)


def test_trained_centroids_shape_and_norm():
    c = np.array(P.ivf_trained_centroids(SF_DIR))
    assert c.shape[0] == P.IVF_CENTROIDS
    norms = np.linalg.norm(c, axis=1)
    assert np.allclose(norms, 1.0)  # spherical k-means codebook


def test_trained_beats_or_matches_fixed_on_sample():
    """Sanity (not the full recall eval — scripts/ann_recall.py): trained
    centroids explain the sample at least as well as fixed gaussians by
    mean max-dot."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["embedding"])
    arr = t.column("embedding").combine_chunks()
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    dim = int(arr.offsets.to_numpy()[1])
    x = flat.reshape(-1, dim)
    trained = np.array(P.ivf_trained_centroids(SF_DIR))
    fixed = np.array(P._ivf_centroid_literals(dim))
    fixed = fixed / np.linalg.norm(fixed, axis=1, keepdims=True)
    assert (x @ trained.T).max(axis=1).mean() >= (x @ fixed.T).max(axis=1).mean()
