"""MiniARD kernel: one lengthscale per user-defined feature group.

Parity: /root/reference/src/xGPR/kernels/ARD_kernels/mini_ard.py.
- split_points define contiguous feature groups (:84-88);
- hyperparams = (lambda, sigma_1..sigma_k), bounds [[1e-3,1e2]] +
  [[1e-6,1e2]]*k (:89-92);
- transform multiplies each input column by its group's lengthscale then
  runs the plain RBF SORF map (:185-209);
- gradient needs the dense precomputed SORF weight matrix (:208-258).
"""
from functools import partial
from math import ceil

import numpy as np
import jax
import jax.numpy as jnp

from .kernel_baseclass import KernelBaseclass
from ..ops.hadamard import next_pow2
from ..ops.sorf import (rbf_feature_map, rbf_feature_map_dense,
                        dense_threshold_ok)
from ..ops.ard import precompute_sorf_weights, mini_ard_grad
from ..utils import rng as state_rng


@partial(jax.jit, static_argnames=("fit_intercept",))
def _ard_transform(x, ard_weights, radem, chi, fit_intercept):
    return rbf_feature_map(x * ard_weights[None, :], radem, chi,
                           fit_intercept)


@partial(jax.jit, static_argnames=("fit_intercept", "padded"))
def _ard_transform_dense(x, ard_weights, proj, fit_intercept, padded):
    return rbf_feature_map_dense(x * ard_weights[None, :], proj,
                                 fit_intercept, padded)


class MiniARD(KernelBaseclass):
    """Grouped-lengthscale RBF kernel."""

    def __init__(self, xdim, num_rffs, random_seed=123, device=None,
                 double_precision=False, kernel_spec_parms=None):
        super().__init__(xdim, num_rffs, sine_cosine_kernel=True,
                         double_precision=double_precision,
                         kernel_spec_parms=kernel_spec_parms)
        parms = kernel_spec_parms or {}
        if len(self._xdim) != 2:
            raise ValueError("MiniARD only accepts fixed-vector input.")
        if "split_points" not in parms or not isinstance(
                parms["split_points"], list):
            raise ValueError("MiniARD requires kernel_settings with a "
                             "'split_points' list.")
        self.split_pts = np.sort(np.asarray(
            [0] + list(parms["split_points"]) + [xdim[1]]))
        self._check_split_points(xdim)

        n_hparams = self.split_pts.shape[0]
        self.hyperparams = np.ones((n_hparams,))
        self.bounds = np.asarray(
            [[1e-3, 1e2]] + [[1e-6, 1e2]] * (n_hparams - 1))

        padded = next_pow2(xdim[-1])
        nblocks = max(1, ceil(self.num_freqs / padded))
        self.padded_dims, self.nblocks = padded, nblocks
        self._feature_padded = padded
        sdtype = np.float64 if double_precision else np.float32
        self.radem_diag = jnp.asarray(
            state_rng.radem_diagonals(random_seed, nblocks, padded, sdtype))
        self.chi_arr = jnp.asarray(
            state_rng.chi_scaling(random_seed, padded, self.num_freqs,
                                  sdtype))

        self.full_ard_weights = np.zeros((xdim[-1],))
        self._group_slices = [
            (int(self.split_pts[i - 1]), int(self.split_pts[i]))
            for i in range(1, self.split_pts.shape[0])]
        self.precomputed_weights = None
        self.use_dense_projection = dense_threshold_ok(xdim[-1],
                                                       self.num_freqs)
        self.kernel_specific_set_hyperparams()

    def _check_split_points(self, xdim):
        if self.split_pts.shape[0] - 2 < 1:
            raise ValueError("MiniARD needs one or more split points to define its feature groups.")
        if self.split_pts[0] < 0 or self.split_pts[-1] > xdim[1]:
            raise ValueError("Split points out of range.")
        if np.diff(self.split_pts).min() == 0:
            raise ValueError("Duplicate split points supplied.")

    def kernel_specific_set_hyperparams(self):
        for g, (s, e) in enumerate(self._group_slices):
            self.full_ard_weights[s:e] = self.hyperparams[g + 1]

    def _dense_proj(self, dtype):
        self._ensure_precomputed(dtype)
        return self.precomputed_weights.astype(dtype).T

    def kernel_specific_transform(self, input_x, sequence_length=None):
        w = jnp.asarray(self.full_ard_weights, dtype=input_x.dtype)
        if self.use_dense_projection:
            return _ard_transform_dense(input_x, w,
                                        self._dense_proj(input_x.dtype),
                                        self.fit_intercept,
                                        self.padded_dims)
        return _ard_transform(input_x, w,
                              self.radem_diag.astype(input_x.dtype),
                              self.chi_arr.astype(input_x.dtype),
                              self.fit_intercept)

    def feature_params(self):
        from .. import config
        dt = jnp.float64 if self.double_precision else config.fp_dtype()
        params = {"ard_weights": jnp.asarray(self.full_ard_weights,
                                             dtype=dt)}
        if self.use_dense_projection:
            params["proj"] = self._dense_proj(dt)
        else:
            params["radem"] = self.radem_diag.astype(dt)
            params["chi"] = self.chi_arr.astype(dt)
        return params

    def pure_feature_fn(self):
        from .. import config as _cfg
        intercept = self.fit_intercept
        padded = self.padded_dims

        def build():
            if self.use_dense_projection:
                def fn(params, x, seq_len=None):
                    feats = rbf_feature_map_dense(
                        x * params["ard_weights"][None, :], params["proj"],
                        intercept, padded)
                    if intercept:
                        feats = feats.at[:, 0].set(1.0)
                    return feats
            else:
                def fn(params, x, seq_len=None):
                    feats = rbf_feature_map(
                        x * params["ard_weights"][None, :],
                        params["radem"], params["chi"], intercept)
                    if intercept:
                        feats = feats.at[:, 0].set(1.0)
                    return feats
            return fn
        return self._cached_fn("_pure_fn", _cfg.config_epoch(), build)

    def _ensure_precomputed(self, dtype):
        if self.precomputed_weights is None:
            self.precomputed_weights = precompute_sorf_weights(
                self.radem_diag.astype(dtype), self.chi_arr.astype(dtype),
                self._xdim[-1])

    def gradient_params(self):
        from .. import config
        dt = jnp.float64 if self.double_precision else config.fp_dtype()
        params = self.feature_params()
        self._ensure_precomputed(dt)
        params["grad_weights"] = self.precomputed_weights.astype(dt)
        params["sigmas"] = jnp.asarray(self.hyperparams[1:], dtype=dt)
        return params

    def pure_gradient_fn(self):
        from .. import config as _cfg
        intercept = self.fit_intercept
        starts = tuple(s for s, _ in self._group_slices)
        ends = tuple(e for _, e in self._group_slices)

        def build():
            def fn(params, x, seq_len=None):
                z, dz = mini_ard_grad(x, params["grad_weights"], starts,
                                      ends, params["sigmas"], intercept)
                if intercept:
                    z = z.at[:, 0].set(1.0)
                    dz = dz.at[:, 0, :].set(0.0)
                return z, dz
            return fn
        return self._cached_fn("_pure_grad_fn", _cfg.config_epoch(),
                               build)

    def kernel_specific_gradient(self, input_x, sequence_length=None):
        self._ensure_precomputed(input_x.dtype)
        starts = tuple(s for s, _ in self._group_slices)
        ends = tuple(e for _, e in self._group_slices)
        sigma_vals = jnp.asarray(self.hyperparams[1:], dtype=input_x.dtype)
        return mini_ard_grad(input_x,
                             self.precomputed_weights.astype(input_x.dtype),
                             starts, ends, sigma_vals, self.fit_intercept)
