"""Kernel baseclass: shared hyperparameter handling and the transform API.

API parity with the reference's KernelBaseclass
(/root/reference/src/xGPR/kernels/kernel_baseclass.py):
- hyperparams stored linear, get/set in log-space (:218-257);
- hyperparams[0] is the shared noise 'lambda' (:260-265);
- sine-cosine kernels require even num_rffs, num_freqs = num_rffs / 2
  (:80-89);
- transform_x casts input, generates features and overwrites column 0 with
  1.0 when fitting an intercept (:269-299).

Device handling differs by design: JAX owns placement, so there is no
cpu/cuda device shuffling; arrays live wherever the enclosing jit/sharding
puts them.
"""
import abc
import itertools
from abc import ABC

import numpy as np
import jax.numpy as jnp

from .. import config

_KERNEL_UIDS = itertools.count()


class KernelBaseclass(ABC):
    """Base class for all kernels."""

    def __init__(self, xdim, num_rffs, sine_cosine_kernel=False,
                 double_precision=False, kernel_spec_parms=None):
        kernel_spec_parms = kernel_spec_parms or {}
        self.double_precision = double_precision
        if num_rffs < 2:
            raise RuntimeError("Fewer than 2 random features makes no sense; raise num_rffs.")

        if sine_cosine_kernel:
            if num_rffs % 2 != 0:
                raise RuntimeError(
                    "For sine-cosine kernels (e.g. Matern, RBF) num_rffs "
                    "must be an even number.")
            self.num_freqs = num_rffs // 2
            self.num_rffs = num_rffs
        else:
            self.num_freqs = num_rffs
            self.num_rffs = num_rffs

        self.fit_intercept = kernel_spec_parms.get("intercept", True) is not False
        self._xdim = tuple(xdim)
        self.kernel_spec_parms = kernel_spec_parms
        self.hyperparams = None
        self.bounds = None
        self._uid = next(_KERNEL_UIDS)

    def get_uid(self):
        """Process-unique, never-recycled identity for caching (mirrors
        DatasetBaseclass.get_uid; id() can alias a GC'd kernel)."""
        return self._uid

    # ------------------------------------------------------------------
    # abstract interface
    @abc.abstractmethod
    def kernel_specific_transform(self, input_x, sequence_length=None):
        """Generate random features for pre-cast input."""

    @abc.abstractmethod
    def kernel_specific_gradient(self, input_x, sequence_length=None):
        """Generate features plus d(features)/d(kernel hyperparams)."""

    def kernel_specific_set_hyperparams(self):
        """Hook run after hyperparameters change."""
        return

    # ------------------------------------------------------------------
    # hyperparameter plumbing
    def get_hyperparams(self, logspace=True):
        if logspace:
            return np.log(self.hyperparams)
        return self.hyperparams

    def set_hyperparams(self, hyperparams, logspace=True):
        hyperparams = np.asarray(hyperparams, dtype=np.float64)
        if logspace:
            self.hyperparams = np.exp(hyperparams)
        else:
            self.hyperparams = hyperparams.copy()
        self.kernel_specific_set_hyperparams()

    def check_hyperparams(self, hyperparams):
        hyperparams = np.asarray(hyperparams)
        if hyperparams.shape[0] != self.hyperparams.shape[0]:
            raise RuntimeError(
                f"This kernel requires {self.hyperparams.shape[0]} "
                "hyperparameters.")

    def get_lambda(self):
        """The shared noise hyperparameter."""
        return float(self.hyperparams[0])

    def get_bounds(self, logspace=True):
        if logspace:
            return np.log(self.bounds)
        return self.bounds

    def set_bounds(self, bounds, logspace=True):
        bounds = np.asarray(bounds, dtype=np.float64)
        if bounds.shape != self.bounds.shape:
            raise RuntimeError(
                "Bounds must be a (n_hyperparams, 2) array matching the "
                "kernel's hyperparameter count.")
        self.bounds = np.exp(bounds) if logspace else bounds

    def get_num_rffs(self):
        return self.num_rffs

    def variance_column_indices(self, variance_rffs):
        """Columns implementing 'use the first variance_rffs features' for
        posterior variance (exact_fitting_toolkit.py:40-68).  For
        sine-cosine kernels this selects the cos/sin pairs of the first
        variance_rffs/2 frequencies under the block layout; non-trig
        kernels (Linear) override with a plain prefix."""
        from ..ops.layout import variance_column_indices
        import numpy as np
        padded = getattr(self, "_feature_padded", None)
        if padded is None:
            return np.arange(variance_rffs)
        return variance_column_indices(self.num_freqs, padded,
                                       variance_rffs)

    def get_num_freqs(self):
        return self.num_freqs

    def get_xdim(self):
        return self._xdim

    def validate_new_datapoints(self, input_x):
        """Shape-compatibility check (kernel_baseclass.py:196-218)."""
        if input_x.ndim != len(self._xdim):
            return False
        if len(self._xdim) == 3:
            if input_x.shape[2] != self._xdim[2] or input_x.shape[1] < 1:
                return False
        elif input_x.shape[1] != self._xdim[1]:
            return False
        return True

    # ------------------------------------------------------------------
    # functional API: a pure feature function + parameter pytree.
    # This is the TPU-first entry point -- solvers jit / scan / shard_map
    # over it directly, with hyperparameters passed as traced arrays so
    # tuning never triggers recompilation.
    def feature_params(self):
        """Return the pytree of arrays the pure feature fn consumes."""
        raise NotImplementedError

    def pure_feature_fn(self):
        """Return fn(params, x, seq_len_or_None) -> (N, num_rffs) features.

        The returned fn is pure and jittable; it must already apply the
        intercept-column overwrite.  The fn identity is stable per kernel
        instance so jit caches are reused.
        """
        raise NotImplementedError

    def pure_feature_parts_fn(self):
        """Optional fast path: fn(params, x, seq_len) -> (cos, sin) parts
        without the canonical layout assembly, for solvers that contract
        Z^T(Zv) permutation-invariantly.  None if unsupported."""
        return None

    def pure_ztzv_parts_fn(self):
        """Optional fully-fused chunk matvec:
        fn(params, x, seq_len, mask, v_c, v_s) -> (oc, os) or None at
        trace time when the shapes are unsupported.  None if the kernel
        has no fused path."""
        return None

    def _cached_fn(self, attr, key, builder):
        """Per-kernel traced-fn cache.  `key` must include everything the
        trace depends on beyond the kernel's own state -- callers pass
        config.config_epoch() (bumped by every config setter) plus any
        static gates -- so config switches rebuild fn identities and
        every downstream jit cache keyed on them."""
        cached = getattr(self, attr, None)
        if cached is not None and cached[0] == key:
            return cached[1]
        fn = builder()
        setattr(self, attr, (key, fn))
        return fn

    def gradient_params(self):
        """Pytree of arrays consumed by pure_gradient_fn.  Defaults to
        feature_params; kernels that need extra gradient-only state
        (MiniARD's dense weight matrix) extend it."""
        return self.feature_params()

    def pure_gradient_fn(self):
        """Return fn(params, x, seq_len_or_None) -> (feats, dfeats) with
        dfeats of shape (N, num_rffs, n_sigma), or None if the kernel has
        no pure gradient path.  Like pure_feature_fn, the returned fn is
        pure and jittable with hyperparameters flowing through params, so
        exact-gradient tuning (L-BFGS-B) never recompiles; solvers scan /
        shard_map over it directly."""
        return None

    def feature_positions(self):
        """(cos_pos, sin_pos) canonical column positions per frequency
        (ops/layout.py), for solvers using the parts fast path."""
        from ..ops.layout import freq_positions
        padded = getattr(self, "_feature_padded", None)
        if padded is None:
            return None
        return freq_positions(self.num_freqs, padded)

    def _finalize(self, feats):
        """Apply the intercept column inside pure feature fns."""
        if self.fit_intercept:
            feats = feats.at[:, 0].set(1.0)
        return feats

    # ------------------------------------------------------------------
    # transforms
    def _cast_input(self, input_x):
        dtype = config.fp_dtype() if not self.double_precision \
            else jnp.float64
        return jnp.asarray(input_x, dtype=dtype)

    def transform_x(self, input_x, sequence_length=None):
        """Generate random features; returns a jnp array (N, num_rffs)."""
        xin = self._cast_input(input_x)
        slen = None
        if sequence_length is not None:
            slen = jnp.asarray(sequence_length, dtype=jnp.int32)
        xtrans = self.kernel_specific_transform(xin, slen)
        if self.fit_intercept:
            xtrans = xtrans.at[:, 0].set(1.0)
        return xtrans

    def transform_x_y(self, input_x, input_y, sequence_length=None,
                      classification=False):
        xtrans = self.transform_x(input_x, sequence_length)
        if classification:
            y_out = jnp.asarray(input_y, dtype=jnp.int32)
        else:
            y_out = jnp.asarray(input_y, dtype=config.fp_dtype())
        return xtrans, y_out

    def gradient_x(self, input_x, sequence_length=None):
        xin = self._cast_input(input_x)
        slen = None
        if sequence_length is not None:
            slen = jnp.asarray(sequence_length, dtype=jnp.int32)
        xtrans, xgrad = self.kernel_specific_gradient(xin, slen)
        if self.fit_intercept:
            xtrans = xtrans.at[:, 0].set(1.0)
            if xgrad.shape[2] > 0:
                xgrad = xgrad.at[:, 0, :].set(0.0)
        return xtrans, xgrad

    def gradient_x_y(self, input_x, input_y, sequence_length=None):
        xtrans, dz_dsigma = self.gradient_x(input_x, sequence_length)
        y_out = jnp.asarray(input_y, dtype=config.fp_dtype())
        return xtrans, dz_dsigma, y_out
