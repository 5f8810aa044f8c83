"""Approximate kernelized classification.

Parity: /root/reference/src/xGPR/xgp_classification.py -- softmax predict,
nonlinear CG fit with a Nystrom-preconditioner H0.
"""
import numpy as np
import jax.numpy as jnp

from .baseclass import ModelBaseclass
from ..fitting.softmax_solver import fit_softmax_ncg


class GPClassification(ModelBaseclass):
    """Approximate kernelized multinomial-logistic classification."""

    def __init__(self, num_rffs=256, kernel_choice="RBF", device=None,
                 kernel_settings=None, verbose=True, random_seed=123):
        if kernel_settings is not None and \
                not isinstance(kernel_settings, dict):
            raise RuntimeError("kernel_settings must be a dict.")
        super().__init__(num_rffs, 0, kernel_choice, device=device,
                         kernel_settings=kernel_settings, verbose=verbose,
                         random_seed=random_seed)
        self.is_regression = False

    def predict(self, input_x, sequence_lengths=None, chunk_size=2000):
        """Class-probability predictions (xgp_classification.py:59-109)."""
        self.pre_prediction_checks(input_x, sequence_lengths, False)
        input_x = self._bucket_sequence_axis(input_x)
        if self.gamma is None:
            raise RuntimeError("Model has not been fitted yet.")
        preds = []
        weights = jnp.asarray(self.weights)
        gamma = jnp.asarray(self.gamma)
        for i in range(0, input_x.shape[0], chunk_size):
            cut = min(i + chunk_size, input_x.shape[0])
            slen = None if sequence_lengths is None else \
                sequence_lengths[i:cut]
            xfeatures = self.kernel.transform_x(input_x[i:cut, ...], slen)
            pred = xfeatures @ weights + gamma[None, :]
            pred = pred - jnp.max(pred, axis=1, keepdims=True)
            pred = jnp.exp(pred)
            pred = pred / jnp.sum(pred, axis=1, keepdims=True)
            preds.append(np.asarray(pred))
        return np.vstack(preds)

    def fit(self, dataset, preconditioner=None, tol=1e-3, max_iter=500,
            max_rank=3000, min_rank=512, autoselect_target_ratio=30.,
            always_use_srht2=False, run_diagnostics=False):
        """Fit via preconditioned nonlinear CG
        (xgp_classification.py:113-200)."""
        self._run_pre_fitting_prep(dataset)
        self.weights = None
        self.n_classes = int(dataset.get_n_classes())
        if self.verbose:
            print("starting fitting")

        if preconditioner is None:
            preconditioner = self._autoselect_preconditioner(
                dataset, min_rank=min_rank, max_rank=max_rank,
                ratio_target=autoselect_target_ratio,
                always_use_srht2=always_use_srht2)
        engine = self._engine(dataset)
        self.weights, n_iter, losses = fit_softmax_ncg(
            engine, self.n_classes, preconditioner, max_iter, tol,
            self.verbose)
        self.gamma = np.zeros((self.n_classes,))
        if self.verbose:
            print(f"CG iterations: {n_iter}")
            print("Fitting complete.")
        if run_diagnostics:
            return n_iter, losses
