"""Two-layer convolution kernel and the maxpool feature extractor.

Parity:
- Conv1dTwoLayer (l2_conv1d.py:60-222): layer 1 is a hyperparameter-free
  ReLU + global-maxpool conv SORF map with init_rffs outputs; layer 2 is a
  plain RBF SORF map on that profile (sigma applied between the layers).
- FHTMaxpoolConv1dFeatureExtractor (conv_feature_extractor.py): the same
  layer-1 operation exposed standalone for the FastConv1d static layer.
"""
from functools import partial
from math import ceil

import numpy as np
import jax
import jax.numpy as jnp

from .kernel_baseclass import KernelBaseclass
from ..ops.hadamard import next_pow2
from ..ops.conv import conv_maxpool_features
from ..ops.sorf import (rbf_feature_map, rbf_feature_map_grad,
                        rbf_feature_map_dense)
from ..utils import rng as state_rng


@partial(jax.jit, static_argnames=("width",))
def _maxpool_transform(x, slen, radem, chi, width):
    return conv_maxpool_features(x, slen, radem, chi, width)


@partial(jax.jit, static_argnames=("width",))
def _maxpool_transform_dense(x, slen, radem, chi, width, proj):
    return conv_maxpool_features(x, slen, radem, chi, width, proj=proj)


class Conv1dTwoLayer(KernelBaseclass):
    """ReLU-maxpool conv features fed into an RBF SORF map."""

    def __init__(self, xdim, num_rffs, random_seed=123, device=None,
                 double_precision=False, kernel_spec_parms=None):
        parms = kernel_spec_parms or {}
        if "conv_width" not in parms:
            raise ValueError("conv_width must be included as a "
                             "kernel-specific parameter.")
        if "init_rffs" not in parms:
            raise ValueError("init_rffs must be included for the two layer "
                             "conv1d kernel.")
        if len(xdim) != 3:
            raise RuntimeError("Conv1dTwoLayer requires 3d input.")
        self.init_rffs = int(parms["init_rffs"])
        if self.init_rffs % 2 != 0:
            raise RuntimeError("init_rffs should be an even number.")

        super().__init__(xdim, num_rffs, sine_cosine_kernel=True,
                         double_precision=double_precision,
                         kernel_spec_parms=parms)
        self.hyperparams = np.ones((2,))
        self.bounds = np.asarray([[1e-3, 5], [1e-6, 1e2]])
        self.conv_width = int(parms["conv_width"])

        sdtype = np.float64 if double_precision else np.float32
        rng_master = np.random.default_rng(random_seed)
        seed1 = random_seed
        seed2 = int(rng_master.integers(0, 2**31 - 1))

        # Layer 1: maxpool conv projection with init_rffs outputs.
        padded1 = next_pow2(self.conv_width * xdim[2])
        nblocks1 = max(1, ceil(self.init_rffs / padded1))
        self.radem_diag1 = jnp.asarray(
            state_rng.radem_diagonals(seed1, nblocks1, padded1, sdtype))
        self.chi_arr1 = jnp.asarray(
            state_rng.chi_scaling(seed1, padded1, self.init_rffs, sdtype))

        # Layer 2: RBF on the init_rffs-dim profile.
        padded2 = next_pow2(self.init_rffs)
        self._feature_padded = padded2
        nblocks2 = max(1, ceil(self.num_freqs / padded2))
        self.radem_diag2 = jnp.asarray(
            state_rng.radem_diagonals(seed2, nblocks2, padded2, sdtype))
        self.chi_arr2 = jnp.asarray(
            state_rng.chi_scaling(seed2, padded2, self.num_freqs, sdtype))
        from ..ops.sorf import dense_threshold_ok
        self.use_dense_projection = (
            dense_threshold_ok(self.conv_width * xdim[2], self.init_rffs)
            and dense_threshold_ok(self.init_rffs, self.num_freqs))
        self._dense_proj_cache = {}

    def _dense_projs(self, dtype):
        """(layer-1 proj, layer-2 proj) dense matrices, cached per dtype."""
        from ..ops.sorf import dense_sorf_projection
        key = jnp.dtype(dtype).name
        projs = self._dense_proj_cache.get(key)
        if projs is None:
            p1 = dense_sorf_projection(self.radem_diag1.astype(dtype),
                                       self.chi_arr1.astype(dtype),
                                       self.conv_width * self._xdim[2])
            p2 = dense_sorf_projection(self.radem_diag2.astype(dtype),
                                       self.chi_arr2.astype(dtype),
                                       self.init_rffs)
            projs = (p1, p2)
            self._dense_proj_cache = {key: projs}
        return projs

    def _layer1(self, input_x, sequence_length):
        if sequence_length is None:
            raise ValueError(
                "Convolution kernels cannot run without per-row sequence lengths.")
        if input_x.shape[2] != self._xdim[2]:
            raise RuntimeError("Unexpected input shape supplied.")
        if self.use_dense_projection:
            p1, _ = self._dense_projs(input_x.dtype)
            return _maxpool_transform_dense(
                input_x, sequence_length,
                self.radem_diag1.astype(input_x.dtype),
                self.chi_arr1.astype(input_x.dtype), self.conv_width, p1)
        return _maxpool_transform(input_x, sequence_length,
                                  self.radem_diag1.astype(input_x.dtype),
                                  self.chi_arr1.astype(input_x.dtype),
                                  self.conv_width)

    def kernel_specific_transform(self, input_x, sequence_length=None):
        feats = self._layer1(input_x, sequence_length)
        sigma = jnp.asarray(self.hyperparams[1], dtype=feats.dtype)
        if self.use_dense_projection:
            _, p2 = self._dense_projs(feats.dtype)
            return rbf_feature_map_dense(feats * sigma, p2,
                                         self.fit_intercept,
                                         self._feature_padded)
        return rbf_feature_map(feats * sigma,
                               self.radem_diag2.astype(feats.dtype),
                               self.chi_arr2.astype(feats.dtype),
                               self.fit_intercept)

    def kernel_specific_gradient(self, input_x, sequence_length=None):
        feats = self._layer1(input_x, sequence_length)
        sigma = jnp.asarray(self.hyperparams[1], dtype=feats.dtype)
        return rbf_feature_map_grad(feats,
                                    self.radem_diag2.astype(feats.dtype),
                                    self.chi_arr2.astype(feats.dtype),
                                    sigma, self.fit_intercept)

    def feature_params(self):
        from .. import config
        dt = jnp.float64 if self.double_precision else config.fp_dtype()
        params = {"radem1": self.radem_diag1.astype(dt),
                  "chi1": self.chi_arr1.astype(dt),
                  "radem2": self.radem_diag2.astype(dt),
                  "chi2": self.chi_arr2.astype(dt),
                  "sigma": jnp.asarray(self.hyperparams[1], dtype=dt)}
        if self.use_dense_projection:
            p1, p2 = self._dense_projs(dt)
            params["proj1"] = p1
            params["proj2"] = p2
        return params

    def pure_gradient_fn(self):
        from .. import config as _cfg
        intercept = self.fit_intercept
        width = self.conv_width
        use_dense = self.use_dense_projection

        def build():
            def fn(params, x, seq_len):
                prof = conv_maxpool_features(
                    x, seq_len, params["radem1"], params["chi1"], width,
                    proj=params.get("proj1") if use_dense else None)
                z, dz = rbf_feature_map_grad(prof, params["radem2"],
                                             params["chi2"],
                                             params["sigma"], intercept)
                if intercept:
                    z = z.at[:, 0].set(1.0)
                    dz = dz.at[:, 0, :].set(0.0)
                return z, dz
            return fn
        return self._cached_fn("_pure_grad_fn", _cfg.config_epoch(),
                               build)

    def pure_feature_fn(self):
        from .. import config as _cfg
        intercept = self.fit_intercept
        width = self.conv_width
        padded2 = self._feature_padded
        use_dense = self.use_dense_projection

        def build():
            def fn(params, x, seq_len):
                prof = conv_maxpool_features(
                    x, seq_len, params["radem1"], params["chi1"], width,
                    proj=params.get("proj1") if use_dense else None)
                if use_dense:
                    feats = rbf_feature_map_dense(prof * params["sigma"],
                                                  params["proj2"],
                                                  intercept, padded2)
                else:
                    feats = rbf_feature_map(prof * params["sigma"],
                                            params["radem2"],
                                            params["chi2"], intercept)
                if intercept:
                    feats = feats.at[:, 0].set(1.0)
                return feats
            return fn
        return self._cached_fn("_pure_fn", _cfg.config_epoch(), build)


class FHTMaxpoolConv1dFeatureExtractor:
    """Hyperparameter-free maxpool conv extractor used by FastConv1d."""

    def __init__(self, seq_width, num_features, conv_width=9,
                 random_seed=123, double_precision=False):
        self.num_features = int(num_features)
        self.conv_width = int(conv_width)
        self.seq_width = int(seq_width)
        sdtype = np.float64 if double_precision else np.float32
        padded = next_pow2(self.conv_width * seq_width)
        nblocks = max(1, ceil(self.num_features / padded))
        self.radem_diag = jnp.asarray(
            state_rng.radem_diagonals(random_seed, nblocks, padded, sdtype))
        self.chi_arr = jnp.asarray(
            state_rng.chi_scaling(random_seed, padded, self.num_features,
                                  sdtype))
        from ..ops.sorf import dense_threshold_ok
        self.use_dense_projection = dense_threshold_ok(
            self.conv_width * seq_width, self.num_features)
        self._dense_proj_cache = {}

    def _dense_proj(self, dtype):
        from ..ops.sorf import dense_sorf_projection
        key = jnp.dtype(dtype).name
        proj = self._dense_proj_cache.get(key)
        if proj is None:
            proj = dense_sorf_projection(self.radem_diag.astype(dtype),
                                         self.chi_arr.astype(dtype),
                                         self.conv_width * self.seq_width)
            self._dense_proj_cache = {key: proj}
        return proj

    def transform_x(self, input_x, sequence_length):
        from .. import config
        x = jnp.asarray(input_x, dtype=config.fp_dtype())
        slen = jnp.asarray(sequence_length, dtype=jnp.int32)
        if self.use_dense_projection:
            return _maxpool_transform_dense(
                x, slen, self.radem_diag.astype(x.dtype),
                self.chi_arr.astype(x.dtype), self.conv_width,
                self._dense_proj(x.dtype))
        return _maxpool_transform(x, slen,
                                  self.radem_diag.astype(x.dtype),
                                  self.chi_arr.astype(x.dtype),
                                  self.conv_width)
