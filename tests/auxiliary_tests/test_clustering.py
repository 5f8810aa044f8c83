"""Kernel PCA / k-means auxiliary tools."""
import sys
import os
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xgpr_tpu.models.clustering import KernelPCA, KernelKMeans


def _blobs(seed=0, n_per=120, d=8):
    rng = np.random.default_rng(seed)
    centers = np.array([[3.0] * d, [-3.0] * d, [3.0] * (d // 2) +
                        [-3.0] * (d - d // 2)])
    xs, ys = [], []
    for k, c in enumerate(centers):
        xs.append(c + rng.standard_normal((n_per, d)))
        ys.append(np.full(n_per, k))
    idx = rng.permutation(3 * n_per)
    return np.vstack(xs)[idx], np.concatenate(ys)[idx]


def test_kernel_kmeans_recovers_blobs():
    x, y = _blobs()
    km = KernelKMeans(n_clusters=3, num_rffs=256,
                      hyperparams=np.array([np.log(0.1)]), num_features=8,
                      verbose=False)
    km.fit(x)
    labels = km.predict(x)
    # cluster purity: each true class maps dominantly to one label
    purity = 0
    for k in range(3):
        vals, counts = np.unique(labels[y == k], return_counts=True)
        purity += counts.max()
    assert purity / x.shape[0] > 0.9


def test_kernel_pca_shapes_and_separation():
    x, y = _blobs(seed=1)
    pca = KernelPCA(n_components=2, num_rffs=256,
                    hyperparams=np.array([np.log(0.1)]), num_features=8,
                    verbose=False)
    proj = pca.fit_transform(x)
    assert proj.shape == (x.shape[0], 2)
    assert np.all(np.asarray(pca.explained_variance_) >= -1e-8)
    # class means should be separated in the projected space
    means = np.stack([proj[y == k].mean(axis=0) for k in range(3)])
    dists = np.linalg.norm(means[:, None] - means[None, :], axis=-1)
    spread = proj.std()
    assert dists[np.triu_indices(3, 1)].min() > spread
