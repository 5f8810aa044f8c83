"""Approximate kernelized classification.

Parity: /root/reference/src/xGPR/xgp_classification.py -- softmax predict,
nonlinear CG fit with a Nystrom-preconditioner H0.
"""
import numpy as np
import jax
import jax.numpy as jnp

from .baseclass import ModelBaseclass
from .. import config as _cfg
from ..fitting.softmax_solver import fit_softmax_ncg


class GPClassification(ModelBaseclass):
    """Approximate kernelized multinomial-logistic classification."""

    def __init__(self, num_rffs=256, kernel_choice="RBF", device=None,
                 kernel_settings=None, verbose=True, random_seed=123):
        if kernel_settings is not None and \
                not isinstance(kernel_settings, dict):
            raise RuntimeError("Pass kernel_settings as a dict of option name -> value.")
        super().__init__(num_rffs, 0, kernel_choice, device=device,
                         kernel_settings=kernel_settings, verbose=verbose,
                         random_seed=random_seed)
        self.is_regression = False

    def _scanned_predict_fn(self):
        """Whole-input softmax predict as one device program (chunks
        scanned inside jit; see GPRegression._scanned_predict_fn)."""
        feature_fn = self.kernel.pure_feature_fn()
        cached = getattr(self, "_scanned_predict", None)
        if cached is not None and cached[0] is feature_fn:
            return cached[1]

        @jax.jit
        def run(params, x, slen, weights, gamma):
            mp = _cfg.matmul_precision()

            def body(_, batch):
                xb, lb = batch
                z = feature_fn(params, xb, lb)
                pred = jnp.matmul(z, weights, precision=mp) + \
                    gamma[None, :]
                pred = pred - jnp.max(pred, axis=1, keepdims=True)
                pred = jnp.exp(pred)
                return None, pred / jnp.sum(pred, axis=1, keepdims=True)
            _, probs = jax.lax.scan(body, None, (x, slen))
            return probs.reshape(-1, probs.shape[-1])
        self._scanned_predict = (feature_fn, run)
        return run

    def export_predict_fn(self):
        """Export a PURE jittable softmax-probability function + state
        pytree for serving (see GPRegression.export_predict_fn)."""
        if self.kernel is None or self.weights is None or \
                self.gamma is None:
            raise RuntimeError("Call fit() before predicting.")
        feature_fn = self.kernel.pure_feature_fn()
        w = jnp.asarray(self.weights)
        state = {
            "params": self.kernel.feature_params(),
            "weights": w,
            "gamma": jnp.asarray(self.gamma, w.dtype),
        }

        def fn(state, x, seq_len=None):
            mp = _cfg.matmul_precision()
            z = feature_fn(state["params"], x, seq_len)
            pred = jnp.matmul(z, state["weights"], precision=mp) + \
                state["gamma"][None, :]
            pred = pred - jnp.max(pred, axis=1, keepdims=True)
            pred = jnp.exp(pred)
            return pred / jnp.sum(pred, axis=1, keepdims=True)
        return fn, state

    def predict(self, input_x, sequence_lengths=None, chunk_size=2000):
        """Class-probability predictions (xgp_classification.py:59-109)."""
        self.pre_prediction_checks(input_x, sequence_lengths, False)
        input_x = self._bucket_sequence_axis(input_x)
        if self.gamma is None:
            raise RuntimeError("Call fit() before predicting.")
        weights = jnp.asarray(self.weights)
        gamma = jnp.asarray(self.gamma, weights.dtype)

        n = input_x.shape[0]
        n_elements = int(np.prod(input_x.shape))
        if n > chunk_size and n_elements < 10 ** 8:
            # One dispatch for the whole call (see GPRegression.predict).
            run = self._scanned_predict_fn()
            xc, slen, n = self._pad_and_chunk(input_x, sequence_lengths,
                                              chunk_size)
            probs = run(self.kernel.feature_params(), xc, slen, weights,
                        gamma)
            return np.asarray(probs)[:n]

        preds = []
        for i in range(0, input_x.shape[0], chunk_size):
            cut = min(i + chunk_size, input_x.shape[0])
            slen = None if sequence_lengths is None else \
                sequence_lengths[i:cut]
            xfeatures = self.kernel.transform_x(input_x[i:cut, ...], slen)
            pred = jnp.matmul(xfeatures, weights,
                              precision=_cfg.matmul_precision()) + \
                gamma[None, :]
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
