"""Approximate kernel PCA and kernel k-means on random features.

The reference exposes only the feature generator (KernelFGen,
kernel_fgen.py:1-5: "for approximate kernel k-means clustering or for
other tasks") and leaves clustering to the user; BASELINE.json's config
list names "kernel PCA / k-means auxiliary ops" explicitly, so this build
ships both as first-class tools layered on KernelFGen: with random
features z(x), kernel PCA is ordinary PCA of z and kernel k-means is
ordinary k-means in z-space.
"""
import numpy as np
import jax
import jax.numpy as jnp

from .kernel_fgen import AuxiliaryBaseclass

def _PREC():
    from .. import config as _cfg
    return _cfg.matmul_precision()


class KernelPCA(AuxiliaryBaseclass):
    """Approximate kernel PCA via random features."""

    def __init__(self, n_components, num_rffs, hyperparams, num_features,
                 kernel_choice="RBF", device=None, kernel_settings=None,
                 random_seed=123, verbose=True):
        super().__init__(num_rffs, hyperparams, num_features,
                         kernel_choice, device, kernel_settings,
                         random_seed, verbose)
        self.n_components = int(n_components)
        self.mean_ = None
        self.components_ = None
        self.explained_variance_ = None

    def _features(self, input_x, sequence_lengths, chunk_size=2000):
        feats = []
        for i in range(0, input_x.shape[0], chunk_size):
            cut = min(i + chunk_size, input_x.shape[0])
            slen = None if sequence_lengths is None else \
                sequence_lengths[i:cut]
            feats.append(self.kernel.transform_x(input_x[i:cut, ...],
                                                 slen))
        return jnp.concatenate(feats, axis=0)

    def fit(self, input_x, sequence_lengths=None, chunk_size=2000):
        """Streamed covariance accumulation + eigendecomposition."""
        m = self.kernel.get_num_rffs()
        cov = jnp.zeros((m, m))
        mean = jnp.zeros((m,))
        n = input_x.shape[0]
        for i in range(0, n, chunk_size):
            cut = min(i + chunk_size, n)
            slen = None if sequence_lengths is None else \
                sequence_lengths[i:cut]
            z = self.kernel.transform_x(input_x[i:cut, ...], slen)
            cov = cov + jnp.matmul(z.T, z, precision=_PREC())
            mean = mean + z.sum(axis=0)
        mean = mean / n
        cov = cov / n - jnp.outer(mean, mean)
        eigvals, eigvecs = jnp.linalg.eigh(cov)
        order = jnp.argsort(eigvals)[::-1][:self.n_components]
        self.mean_ = mean
        self.components_ = eigvecs[:, order].T
        self.explained_variance_ = eigvals[order]
        return self

    def transform(self, input_x, sequence_lengths=None, chunk_size=2000):
        if self.components_ is None:
            raise RuntimeError("KernelPCA has not been fitted yet.")
        z = self._features(input_x, sequence_lengths, chunk_size)
        return np.asarray((z - self.mean_[None, :]) @ self.components_.T)

    def fit_transform(self, input_x, sequence_lengths=None,
                      chunk_size=2000):
        self.fit(input_x, sequence_lengths, chunk_size)
        return self.transform(input_x, sequence_lengths, chunk_size)


class KernelKMeans(AuxiliaryBaseclass):
    """Approximate kernel k-means: Lloyd's algorithm in feature space."""

    def __init__(self, n_clusters, num_rffs, hyperparams, num_features,
                 kernel_choice="RBF", device=None, kernel_settings=None,
                 random_seed=123, verbose=True, max_iter=100, tol=1e-5):
        super().__init__(num_rffs, hyperparams, num_features,
                         kernel_choice, device, kernel_settings,
                         random_seed, verbose)
        self.n_clusters = int(n_clusters)
        self.max_iter = max_iter
        self.tol = tol
        self.random_seed = random_seed
        self.cluster_centers_ = None

    def fit(self, input_x, sequence_lengths=None, chunk_size=2000):
        z = []
        for i in range(0, input_x.shape[0], chunk_size):
            cut = min(i + chunk_size, input_x.shape[0])
            slen = None if sequence_lengths is None else \
                sequence_lengths[i:cut]
            z.append(self.kernel.transform_x(input_x[i:cut, ...], slen))
        z = jnp.concatenate(z, axis=0)
        n = z.shape[0]

        rng = np.random.default_rng(self.random_seed)
        # k-means++ style greedy seeding on a subsample.
        first = int(rng.integers(0, n))
        centers = [z[first]]
        for _ in range(self.n_clusters - 1):
            d2 = jnp.min(jnp.stack([
                jnp.sum((z - c[None, :]) ** 2, axis=1)
                for c in centers]), axis=0)
            probs = np.asarray(d2)
            probs = probs / probs.sum()
            centers.append(z[int(rng.choice(n, p=probs))])
        centers = jnp.stack(centers)

        @jax.jit
        def lloyd_step(centers, z):
            d2 = (jnp.sum(z ** 2, axis=1, keepdims=True)
                  - 2 * jnp.matmul(z, centers.T, precision=_PREC())
                  + jnp.sum(centers ** 2, axis=1)[None, :])
            assign = jnp.argmin(d2, axis=1)
            onehot = jax.nn.one_hot(assign, centers.shape[0],
                                    dtype=z.dtype)
            counts = onehot.sum(axis=0)
            sums = jnp.matmul(onehot.T, z, precision=_PREC())
            new_centers = sums / jnp.clip(counts, min=1.0)[:, None]
            new_centers = jnp.where(counts[:, None] > 0, new_centers,
                                    centers)
            shift = jnp.sum((new_centers - centers) ** 2)
            return new_centers, assign, shift

        for _ in range(self.max_iter):
            centers, assign, shift = lloyd_step(centers, z)
            if float(shift) < self.tol:
                break
        self.cluster_centers_ = centers
        self.labels_ = np.asarray(assign)
        return self

    def predict(self, input_x, sequence_lengths=None, chunk_size=2000):
        if self.cluster_centers_ is None:
            raise RuntimeError("KernelKMeans has not been fitted yet.")
        labels = []
        for i in range(0, input_x.shape[0], chunk_size):
            cut = min(i + chunk_size, input_x.shape[0])
            slen = None if sequence_lengths is None else \
                sequence_lengths[i:cut]
            z = self.kernel.transform_x(input_x[i:cut, ...], slen)
            d2 = (jnp.sum(z ** 2, axis=1, keepdims=True)
                  - 2 * z @ self.cluster_centers_.T
                  + jnp.sum(self.cluster_centers_ ** 2, axis=1)[None, :])
            labels.append(np.asarray(jnp.argmin(d2, axis=1)))
        return np.concatenate(labels)
