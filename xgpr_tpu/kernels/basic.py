"""Fixed-vector SORF kernels: RBF, Matern, Cauchy, Linear.

Parity notes (citations into /root/reference):
- SORF state setup: sorf_kernel_baseclass.py:71-84 (padded dims, nblocks,
  radem int8 diagonals, chi(df=padded) scaling).
- RBF bounds [[1e-3, 1e1], [1e-6, 1e2]]: rbf.py:34-41.
- Matern chi modification (divide by sqrt(chi2(2nu)/2nu)): matern.py:50-54.
- Cauchy chi modification (multiply by sqrt(Exp(1))): cauchy.py:39-41.
- Linear: identity features + optional intercept column, num_rffs forced to
  D(+1), single lambda hyperparameter: linear.py:30-94.
"""
from functools import partial
from math import ceil

import numpy as np
import jax
import jax.numpy as jnp

from .kernel_baseclass import KernelBaseclass
from ..ops.hadamard import next_pow2
from ..ops.sorf import (rbf_feature_map, rbf_feature_map_grad,
                        dense_sorf_projection, dense_threshold_ok,
                        rbf_feature_map_dense, rbf_feature_map_dense_grad,
                        rbf_feature_parts_dense)
from ..utils import rng as state_rng


class SORFKernelBaseclass(KernelBaseclass):
    """Shared machinery for fixed-vector sine-cosine SORF kernels."""

    def __init__(self, xdim, num_rffs, random_seed=123, device=None,
                 double_precision=False, kernel_spec_parms=None):
        super().__init__(xdim, num_rffs, sine_cosine_kernel=True,
                         double_precision=double_precision,
                         kernel_spec_parms=kernel_spec_parms)
        if len(xdim) != 2:
            raise ValueError(
                "This kernel operates on fixed-length vectors and needs "
                f"a 2d (rows, features) input; got a {len(xdim)}d shape.")
        self.random_seed = random_seed
        padded = next_pow2(xdim[-1])
        nblocks = max(1, ceil(self.num_freqs / padded))
        self.padded_dims = padded
        self.nblocks = nblocks
        self._feature_padded = padded
        sdtype = np.float64 if double_precision else np.float32
        self.radem_diag = jnp.asarray(
            state_rng.radem_diagonals(random_seed, nblocks, padded, sdtype))
        self._chi_np = state_rng.chi_scaling(random_seed, padded,
                                             self.num_freqs, sdtype)
        self.chi_arr = jnp.asarray(self._chi_np)
        # Dense-projection fast path (see dense_sorf_projection): identical
        # math, MXU-aligned.  Lazily materialised per dtype.
        self.use_dense_projection = dense_threshold_ok(xdim[-1],
                                                       self.num_freqs)
        self._dense_proj_cache = {}

    def _dense_proj(self, dtype):
        key = jnp.dtype(dtype).name
        proj = self._dense_proj_cache.get(key)
        if proj is None:
            proj = dense_sorf_projection(self.radem_diag.astype(dtype),
                                         self.chi_arr.astype(dtype),
                                         self._xdim[-1])
            self._dense_proj_cache = {key: proj}
        return proj

    def _pallas_feature_allowed(self):
        """Static (Python-time) gate for the fused Pallas feature map."""
        from .. import config as _cfg
        if not self.use_dense_projection:
            return False
        mode = _cfg.feature_map_mode()
        if mode == "xla":
            return False
        if mode == "auto" and _cfg.default_backend() == "cpu":
            return False
        return True

    def kernel_specific_transform(self, input_x, sequence_length=None):
        if self._pallas_feature_allowed() and \
                input_x.dtype == jnp.float32:
            # Route one-shot transforms (KernelFGen, sampled sketches)
            # through the fused feature map too; pure_feature_fn applies
            # the intercept column, transform_x re-applies idempotently.
            # Cache keyed on the pure fn identity so config-mode switches
            # rebuild instead of reusing a stale program.
            pure = self.pure_feature_fn()
            cached = getattr(self, "_jit_transform", None)
            if cached is None or cached[0] is not pure:
                cached = (pure, jax.jit(pure))
                self._jit_transform = cached
            return cached[1](self.feature_params(), input_x,
                             sequence_length)
        sigma = jnp.asarray(self.hyperparams[1], dtype=input_x.dtype)
        if self.use_dense_projection:
            return _rbf_transform_dense(input_x * sigma,
                                        self._dense_proj(input_x.dtype),
                                        self.fit_intercept,
                                        self.padded_dims)
        return _rbf_transform(input_x, self.radem_diag.astype(input_x.dtype),
                              self.chi_arr.astype(input_x.dtype), sigma,
                              self.fit_intercept)

    def feature_params(self):
        from .. import config
        dt = jnp.float64 if self.double_precision else config.fp_dtype()
        params = {"sigma": jnp.asarray(self.hyperparams[1], dtype=dt)}
        if self.use_dense_projection:
            params["proj"] = self._dense_proj(dt)
        else:
            params["radem"] = self.radem_diag.astype(dt)
            params["chi"] = self.chi_arr.astype(dt)
        return params

    def poly_range_ok(self, input_x):
        """Host-side check that every feature-map argument this input can
        produce stays inside the polynomial sincos' Cody-Waite range.

        Bound: max|arg| <= sigma * max_row ||x|| * max_col ||proj||.  The
        projection column norms and the current sigma are host-known per
        kernel state, so predict paths can decide AT TRACE TIME whether
        the runtime lax.cond guard (which compiles BOTH feature-map
        implementations into the program) is needed at all.
        """
        from ..ops.sincos import _POLY_ARG_LIMIT
        if not (self.use_dense_projection and self._pallas_feature_allowed()):
            return False
        from .. import config as _cfg
        dt = np.float32 if not self.double_precision else np.float64
        # Keyed on the config epoch like every other per-kernel cache:
        # the dense projection is seed-deterministic today, but a future
        # config-dependent projection layout must not reuse a stale norm.
        epoch_key = (jnp.dtype(dt).name, _cfg.config_epoch())
        cached = getattr(self, "_proj_colnorm", None)
        if cached is None or cached[0] != epoch_key:
            proj = np.asarray(self._dense_proj(dt))
            cached = (epoch_key, float(np.sqrt(
                np.max(np.sum(proj * proj, axis=0)))))
            self._proj_colnorm = cached
        x = np.asarray(input_x)
        if x.ndim != 2:
            return False
        # einsum with a forced accumulator dtype upcasts through its
        # buffered iterator -- no full float64 copy of a large predict
        # input is ever materialised.
        row_norm = float(np.sqrt(np.max(np.einsum(
            "ij,ij->i", x, x, dtype=np.float64))))
        sigma = float(self.hyperparams[1])  # stored linear
        return abs(sigma) * row_norm * cached[1] < 0.9 * _POLY_ARG_LIMIT

    def pure_feature_fn(self, assume_in_range=False):
        """Pure (params, x, seq_len) -> features fn.

        ``assume_in_range=True`` (callers must have validated the input
        via poly_range_ok) traces ONLY the fused Pallas feature map,
        halving fresh-HLO compile cost on predict paths; the default
        keeps the runtime range guard for traced-sigma fitting paths.
        """
        from .. import config as _cfg
        pallas_ok = self._pallas_feature_allowed()
        assume_in_range = bool(assume_in_range) and pallas_ok
        key = (pallas_ok, _cfg.config_epoch(), assume_in_range)
        cache = getattr(self, "_pure_fns", None)
        if cache is not None and key in cache:
            return cache[key]
        intercept = self.fit_intercept
        padded = self.padded_dims
        num_freqs = self.num_freqs
        if self.use_dense_projection:
            def fn(params, x, seq_len=None):
                xs = x * params["sigma"]
                feats = None
                if pallas_ok:
                    from ..ops.pallas.sorf_pallas import (
                        pallas_feature_shapes_ok, rbf_feature_map_pallas,
                        pad_operands, _round_up)
                    from ..ops.sincos import _POLY_ARG_LIMIT
                    from .. import config as _cfg
                    dp = _round_up(x.shape[-1], 128)
                    if x.ndim == 2 and num_freqs % 64 == 0 and \
                            pallas_feature_shapes_ok(
                                x.shape[0], dp, num_freqs, padded,
                                x.dtype):
                        interp = _cfg.default_backend() == "cpu"
                        xp, pp = pad_operands(xs, params["proj"])

                        if assume_in_range:
                            # Caller validated the argument range
                            # host-side (poly_range_ok): trace only the
                            # fused kernel.
                            feats = rbf_feature_map_pallas(
                                xp, pp, intercept, padded,
                                interpret=interp)
                        else:
                            # The kernel's polynomial sincos is exact
                            # only inside the Cody-Waite range; guard at
                            # runtime with a cheap conservative bound
                            # max|arg| <= max_row ||x|| * max_col ||proj||
                            # and fall back to the (guarded) XLA path
                            # when a large sigma / un-standardised data
                            # could exceed it -- same contract as
                            # ops/sincos.py.
                            row_n = jnp.sqrt(jnp.max(jnp.sum(xp * xp,
                                                             axis=1)))
                            col_n = jnp.sqrt(jnp.max(jnp.sum(pp * pp,
                                                             axis=0)))
                            in_range = row_n * col_n < jnp.asarray(
                                _POLY_ARG_LIMIT, xp.dtype)

                            feats = jax.lax.cond(
                                in_range,
                                lambda a, p: rbf_feature_map_pallas(
                                    a, p, intercept, padded,
                                    interpret=interp),
                                lambda a, p: rbf_feature_map_dense(
                                    a[:, :x.shape[-1]], p[:x.shape[-1]],
                                    intercept, padded),
                                xp, pp)
                    else:
                        from ..utils.fallback import note_fallback
                        note_fallback(
                            "rbf feature map",
                            f"rows={x.shape[0]} d={x.shape[-1]} "
                            f"F={num_freqs} dtype={x.dtype}")
                if feats is None:
                    feats = rbf_feature_map_dense(xs, params["proj"],
                                                  intercept, padded)
                if intercept:
                    feats = feats.at[:, 0].set(1.0)
                return feats
        else:
            def fn(params, x, seq_len=None):
                feats = rbf_feature_map(x * params["sigma"],
                                        params["radem"],
                                        params["chi"], intercept)
                if intercept:
                    feats = feats.at[:, 0].set(1.0)
                return feats
        if cache is None or len(cache) > 4:
            cache = {}
        cache[key] = fn
        self._pure_fns = cache
        return fn

    def kernel_specific_gradient(self, input_x, sequence_length=None):
        sigma = jnp.asarray(self.hyperparams[1], dtype=input_x.dtype)
        if self.use_dense_projection:
            return _rbf_grad_dense(input_x,
                                   self._dense_proj(input_x.dtype), sigma,
                                   self.fit_intercept, self.padded_dims)
        return _rbf_grad(input_x, self.radem_diag.astype(input_x.dtype),
                         self.chi_arr.astype(input_x.dtype), sigma,
                         self.fit_intercept)

    def pure_gradient_fn(self):
        from .. import config as _cfg
        intercept = self.fit_intercept
        padded = self.padded_dims

        def build():
            if self.use_dense_projection:
                def fn(params, x, seq_len=None):
                    z, dz = rbf_feature_map_dense_grad(
                        x, params["proj"], params["sigma"], intercept,
                        padded)
                    if intercept:
                        z = z.at[:, 0].set(1.0)
                        dz = dz.at[:, 0, :].set(0.0)
                    return z, dz
            else:
                def fn(params, x, seq_len=None):
                    z, dz = rbf_feature_map_grad(
                        x, params["radem"], params["chi"],
                        params["sigma"], intercept)
                    if intercept:
                        z = z.at[:, 0].set(1.0)
                        dz = dz.at[:, 0, :].set(0.0)
                    return z, dz
            return fn
        return self._cached_fn("_pure_grad_fn", _cfg.config_epoch(),
                               build)

    def pure_feature_parts_fn(self):
        if not self.use_dense_projection:
            return None
        from .. import config as _cfg
        intercept = self.fit_intercept

        def build():
            def fn(params, x, seq_len=None):
                return rbf_feature_parts_dense(x * params["sigma"],
                                               params["proj"], intercept)
            return fn
        return self._cached_fn("_parts_fn", _cfg.config_epoch(), build)

    def pure_ztzv_parts_fn(self):
        """Fused whole-chunk matvec (ops/pallas/ztzv_pallas.py): computes
        Z^T(Zv) cos/sin partials for one masked chunk without writing Z to
        HBM.  Returns None when the XLA path should be used (non-dense
        projection, matvec mode "xla", or "auto" off-TPU); the returned fn
        itself returns None at trace time for unsupported shapes so the
        solver can fall back per-program."""
        from .. import config as _cfg
        if not self.use_dense_projection:
            return None
        mode = _cfg.matvec_mode()
        if mode == "xla":
            return None
        if mode == "auto" and _cfg.default_backend() == "cpu":
            return None
        intercept = self.fit_intercept
        num_freqs = self.num_freqs

        def fn(params, x, seq_len, m, v_c, v_s):
            from ..ops.pallas.ztzv_pallas import (ztzv_shapes_ok,
                                                  ztzv_parts_pallas)
            if x.ndim != 2 or not ztzv_shapes_ok(
                    x.shape[0], x.shape[1], num_freqs, x.dtype):
                from ..utils.fallback import note_fallback
                note_fallback(
                    "ztzv matvec",
                    f"rows={x.shape[0]} d={x.shape[-1]} "
                    f"F={num_freqs} dtype={x.dtype}")
                return None
            interp = _cfg.default_backend() == "cpu"
            return ztzv_parts_pallas(x, m, params["proj"],
                                     params["sigma"], v_c, v_s,
                                     intercept, num_freqs,
                                     interpret=interp)
        return fn



@partial(jax.jit, static_argnames=("fit_intercept",))
def _rbf_transform(x, radem, chi, sigma, fit_intercept):
    return rbf_feature_map(x * sigma, radem, chi, fit_intercept)


@partial(jax.jit, static_argnames=("fit_intercept",))
def _rbf_grad(x, radem, chi, sigma, fit_intercept):
    return rbf_feature_map_grad(x, radem, chi, sigma, fit_intercept)


@partial(jax.jit, static_argnames=("fit_intercept", "padded"))
def _rbf_transform_dense(x_scaled, proj, fit_intercept, padded):
    return rbf_feature_map_dense(x_scaled, proj, fit_intercept, padded)


@partial(jax.jit, static_argnames=("fit_intercept", "padded"))
def _rbf_grad_dense(x, proj, sigma, fit_intercept, padded):
    return rbf_feature_map_dense_grad(x, proj, sigma, fit_intercept, padded)


class RBF(SORFKernelBaseclass):
    """Gaussian (RBF) kernel via SORF random Fourier features."""

    def __init__(self, xdim, num_rffs, random_seed=123, device=None,
                 double_precision=False, kernel_spec_parms=None):
        super().__init__(xdim, num_rffs, random_seed, device,
                         double_precision, kernel_spec_parms)
        self.hyperparams = np.ones((2,))
        self.bounds = np.asarray([[1e-3, 1e1], [1e-6, 1e2]])


class Matern(SORFKernelBaseclass):
    """Matern kernel (nu in [1/2, 5/2]) via Student-t spectral sampling."""

    def __init__(self, xdim, num_rffs, random_seed=123, device=None,
                 double_precision=False, kernel_spec_parms=None):
        super().__init__(xdim, num_rffs, random_seed, device,
                         double_precision, kernel_spec_parms)
        parms = kernel_spec_parms or {}
        if "matern_nu" not in parms:
            raise ValueError(
                "A Matern kernel requires matern_nu in kernel_settings.")
        self.matern_nu = float(parms["matern_nu"])
        if not 0.5 <= self.matern_nu <= 2.5:
            raise ValueError("matern_nu is only supported on [0.5, 2.5].")
        modifier = state_rng.matern_chi_modifier(
            random_seed, self.num_freqs, self.matern_nu, self._chi_np.dtype)
        self._chi_np = self._chi_np / modifier
        self.chi_arr = jnp.asarray(self._chi_np)
        self.hyperparams = np.ones((2,))
        self.bounds = np.asarray([[1e-3, 1e1], [1e-6, 1e2]])


class Cauchy(SORFKernelBaseclass):
    """Cauchy kernel (rational-quadratic, small alpha limit)."""

    def __init__(self, xdim, num_rffs, random_seed=123, device=None,
                 double_precision=False, kernel_spec_parms=None):
        super().__init__(xdim, num_rffs, random_seed, device,
                         double_precision, kernel_spec_parms)
        modifier = state_rng.cauchy_chi_modifier(
            random_seed, self.num_freqs, self._chi_np.dtype)
        self._chi_np = self._chi_np * modifier
        self.chi_arr = jnp.asarray(self._chi_np)
        self.hyperparams = np.ones((2,))
        self.bounds = np.asarray([[1e-3, 1e1], [1e-6, 1e2]])


class Linear(KernelBaseclass):
    """Linear kernel: identity features plus optional intercept column."""

    def __init__(self, xdim, num_rffs, random_seed=123, device=None,
                 double_precision=False, kernel_spec_parms=None):
        parms = kernel_spec_parms or {}
        fit_intercept = parms.get("intercept", True) is not False
        actual_rffs = xdim[1] + 1 if fit_intercept else xdim[1]
        super().__init__(xdim, actual_rffs,
                         double_precision=double_precision,
                         kernel_spec_parms=parms)
        if len(xdim) > 2:
            raise ValueError("Linear kernels accept 2d (rows, features) "
                             "arrays only — not sequence or graph input.")
        self.fit_intercept = fit_intercept
        self.hyperparams = np.ones((1,))
        self.bounds = np.asarray([[1e-3, 1e1]])

    def kernel_specific_transform(self, input_x, sequence_length=None):
        if self.fit_intercept:
            pad = jnp.zeros((input_x.shape[0], 1), dtype=input_x.dtype)
            return jnp.concatenate([pad, input_x], axis=1)
        return input_x

    def feature_params(self):
        return {}

    def pure_feature_fn(self):
        intercept = self.fit_intercept

        def build():
            def fn(params, x, seq_len=None):
                if intercept:
                    ones = jnp.ones((x.shape[0], 1), dtype=x.dtype)
                    return jnp.concatenate([ones, x], axis=1)
                return x
            return fn
        return self._cached_fn("_pure_fn", 0, build)

    def kernel_specific_gradient(self, input_x, sequence_length=None):
        xtrans = self.kernel_specific_transform(input_x)
        return xtrans, jnp.zeros((xtrans.shape[0], 0, 0),
                                 dtype=input_x.dtype)

    def pure_gradient_fn(self):
        feat = self.pure_feature_fn()

        def build():
            def fn(params, x, seq_len=None):
                z = feat(params, x, seq_len)
                return z, jnp.zeros((z.shape[0], z.shape[1], 0), z.dtype)
            return fn
        return self._cached_fn("_pure_grad_fn", id(feat), build)
