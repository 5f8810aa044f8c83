"""Sequence / graph convolution SORF kernels.

Parity (citations into /root/reference/src/xGPR/kernels/convolution_kernels):
- ConvKernelBaseclass: padded dims = next_pow2(conv_width * D), radem sized
  to ceil(F / padded) blocks, averaging in {none, sqrt, full} -> scaling_type
  0/1/2, sequence_length mandatory (conv_kernel_baseclass.py:73-147).
- Conv1dRBF bounds [[1e-3, 5], [1e-6, 1e2]] (conv1d_rbf.py:54).
- Conv1dMatern / Conv1dCauchy apply the same chi modifications as their
  fixed-vector counterparts (conv1d_matern.py:51-65).
- Graph kernels fix conv_width = 1; GraphRBF bounds [[1e-3, 1e2],
  [1e-2, 1e2]] (graph_rbf.py:42-48).
"""
from functools import partial
from math import ceil

import numpy as np
import jax
import jax.numpy as jnp

from .kernel_baseclass import KernelBaseclass
from ..ops.hadamard import next_pow2
from ..ops.conv import (conv_rbf_features, SCALING_NONE, SCALING_SQRT,
                        SCALING_FULL)
from ..ops.sorf import dense_sorf_projection, dense_threshold_ok
from ..utils import rng as state_rng

_AVERAGING = {"none": SCALING_NONE, "sqrt": SCALING_SQRT,
              "full": SCALING_FULL}


@partial(jax.jit, static_argnames=("width", "scaling_type", "with_grad"))
def _conv_transform(x, slen, radem, chi, sigma, width, scaling_type,
                    with_grad, proj=None):
    return conv_rbf_features(x, slen, radem, chi, sigma, width,
                             scaling_type, with_grad=with_grad, proj=proj)


class ConvKernelBaseclass(KernelBaseclass):
    """Shared setup for k-mer convolution SORF kernels."""

    def __init__(self, xdim, num_rffs, random_seed=123,
                 double_precision=False, conv_width=9,
                 kernel_spec_parms=None):
        super().__init__(xdim, num_rffs, sine_cosine_kernel=True,
                         double_precision=double_precision,
                         kernel_spec_parms=kernel_spec_parms)
        if len(xdim) != 3:
            raise RuntimeError(
                f"Convolution kernels expect 3d (rows, seq, channels) "
                f"input; got a {len(xdim)}d shape.")
        parms = kernel_spec_parms or {}
        averaging = parms.get("averaging", "none")
        if averaging not in _AVERAGING:
            raise RuntimeError(
                "Unrecognized value for 'averaging', should be one of "
                "'none', 'sqrt', 'full'.")
        self.scaling_type = _AVERAGING[averaging]
        self.conv_width = int(conv_width)
        self.random_seed = random_seed

        padded = next_pow2(self.conv_width * xdim[2])
        nblocks = max(1, ceil(self.num_freqs / padded))
        self.padded_dims, self.nblocks = padded, nblocks
        self._feature_padded = padded
        sdtype = np.float64 if double_precision else np.float32
        self.radem_diag = jnp.asarray(
            state_rng.radem_diagonals(random_seed, nblocks, padded, sdtype))
        self._chi_np = state_rng.chi_scaling(random_seed, padded,
                                             self.num_freqs, sdtype)
        self.chi_arr = jnp.asarray(self._chi_np)
        self.use_dense_projection = dense_threshold_ok(
            self.conv_width * xdim[2], self.num_freqs)
        self._dense_proj_cache = {}

    def _dense_proj(self, dtype):
        key = jnp.dtype(dtype).name
        proj = self._dense_proj_cache.get(key)
        if proj is None:
            proj = dense_sorf_projection(self.radem_diag.astype(dtype),
                                         self.chi_arr.astype(dtype),
                                         self.conv_width * self._xdim[2])
            self._dense_proj_cache = {key: proj}
        return proj

    def _require_lengths(self, input_x, sequence_length):
        if sequence_length is None:
            raise RuntimeError(
                "Convolution kernels cannot run without per-row sequence lengths.")
        if input_x.shape[2] != self._xdim[2]:
            raise RuntimeError("Unexpected input shape supplied.")
        # Reference contract (rbf_convolution.cpp:79-84): all lengths must
        # be >= conv_width and <= the sequence axis.
        import numpy as _np
        slen = _np.asarray(sequence_length)
        if slen.size and (int(slen.min()) < self.conv_width or
                          int(slen.max()) > input_x.shape[1]):
            raise RuntimeError(
                "All sequence lengths must be >= conv_width and <= the "
                "size of the sequence axis.")

    def kernel_specific_transform(self, input_x, sequence_length=None):
        self._require_lengths(input_x, sequence_length)
        if self._pallas_conv_allowed() and \
                input_x.dtype == jnp.float32:
            # Route through the (jitted) pure feature fn so one-shot
            # transforms (KernelFGen, sampled sketches) use the fused
            # Pallas window loop too.  pure_feature_fn applies the
            # intercept column; transform_x re-applies it, idempotently.
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
        proj = self._dense_proj(input_x.dtype) \
            if self.use_dense_projection else None
        return _conv_transform(input_x, sequence_length,
                               self.radem_diag.astype(input_x.dtype),
                               self.chi_arr.astype(input_x.dtype), sigma,
                               self.conv_width, self.scaling_type, False,
                               proj)

    def kernel_specific_gradient(self, input_x, sequence_length=None):
        self._require_lengths(input_x, sequence_length)
        sigma = jnp.asarray(self.hyperparams[1], dtype=input_x.dtype)
        proj = self._dense_proj(input_x.dtype) \
            if self.use_dense_projection else None
        return _conv_transform(input_x, sequence_length,
                               self.radem_diag.astype(input_x.dtype),
                               self.chi_arr.astype(input_x.dtype), sigma,
                               self.conv_width, self.scaling_type, True,
                               proj)

    def feature_params(self):
        from .. import config
        dt = jnp.float64 if self.double_precision else config.fp_dtype()
        params = {"radem": self.radem_diag.astype(dt),
                  "chi": self.chi_arr.astype(dt),
                  "sigma": jnp.asarray(self.hyperparams[1], dtype=dt)}
        if self.use_dense_projection:
            params["proj"] = self._dense_proj(dt)
        return params

    def pure_gradient_fn(self):
        from .. import config as _cfg
        intercept = self.fit_intercept
        width = self.conv_width
        scaling = self.scaling_type
        use_dense = self.use_dense_projection

        def build():
            def fn(params, x, seq_len):
                z, dz = conv_rbf_features(
                    x, seq_len, params["radem"], params["chi"],
                    params["sigma"], width, scaling, with_grad=True,
                    proj=params.get("proj") if use_dense else None)
                if intercept:
                    z = z.at[:, 0].set(1.0)
                    dz = dz.at[:, 0, :].set(0.0)
                return z, dz
            return fn
        return self._cached_fn("_pure_grad_fn", _cfg.config_epoch(),
                               build)

    def pure_feature_fn(self):
        from .. import config as _cfg
        pallas_ok = self._pallas_conv_allowed()
        key = (pallas_ok, _cfg.config_epoch())
        cached = getattr(self, "_pure_fn", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        intercept = self.fit_intercept
        width = self.conv_width
        scaling = self.scaling_type
        use_dense = self.use_dense_projection
        padded = self.padded_dims

        if pallas_ok:
            # Canonical features via the fused parts kernel + block-layout
            # assembly (one (N, 2F) relayout vs the XLA path's multi-GB
            # window intermediate).  Falls back inside parts_fn when the
            # shapes are unsupported.
            parts_fn = self.pure_feature_parts_fn()

            def fn(params, x, seq_len):
                from ..ops.layout import assemble_cos_sin
                c, s = parts_fn(params, x, seq_len)
                return assemble_cos_sin(c, s, padded)
            self._pure_fn = (key, fn)
            return fn

        def fn(params, x, seq_len):
            feats = conv_rbf_features(
                x, seq_len, params["radem"], params["chi"],
                params["sigma"], width, scaling,
                proj=params.get("proj") if use_dense else None)
            if intercept:
                feats = feats.at[:, 0].set(1.0)
            return feats
        self._pure_fn = (key, fn)
        return fn

    def _pallas_conv_allowed(self):
        """Static (Python-time) gate for the fused Pallas conv kernel."""
        from .. import config as _cfg
        if not self.use_dense_projection:
            return False
        mode = _cfg.conv_mode()
        if mode == "xla":
            return False
        if mode == "auto" and _cfg.default_backend() == "cpu":
            return False
        return True

    def pure_feature_parts_fn(self):
        """Layout-free (cos, sin) parts: frequency-ordered halves of the
        canonical feature vector, so the fused-CG matvec contracts
        Z^T(Zv) without assembling the (N, 2F) block layout.  Canonical
        column 0 is frequency 0's cos column (ops/layout.py), so the
        intercept overwrite lands on the cos part's column 0.

        On TPU (config.set_conv_mode "auto"/"pallas") the masked window
        loop runs as one fused Pallas kernel
        (ops/pallas/conv_pallas.py); row averaging and the intercept are
        applied here on the (N, F) parts.  The kernel's polynomial sincos
        is guarded at runtime: a conservative norm-product bound on
        max|arg| switches the whole chunk to the (guarded) XLA path when
        a large sigma / un-standardised data could exceed the Cody-Waite
        range -- predict-time inputs are arbitrary, so the fused predict
        path must never silently degrade (same contract as the dense
        feature map, kernels/basic.py)."""
        from .. import config as _cfg
        pallas_ok = self._pallas_conv_allowed()
        key = (pallas_ok, _cfg.config_epoch())
        cached = getattr(self, "_parts_fn", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        intercept = self.fit_intercept
        width = self.conv_width
        scaling = self.scaling_type
        use_dense = self.use_dense_projection
        num_freqs = self.num_freqs

        def xla_parts(x, seq_len, params):
            return conv_rbf_features(
                x, seq_len, params["radem"], params["chi"],
                params["sigma"], width, scaling,
                proj=params.get("proj") if use_dense else None,
                parts=True)

        def pallas_parts(x, seq_len, params):
            from ..ops.pallas.conv_pallas import conv_parts_pallas
            from .. import config as _icfg
            interp = _icfg.default_backend() == "cpu"
            c, s = conv_parts_pallas(
                x, seq_len, params["proj"], params["sigma"],
                width, num_freqs, interpret=interp)
            from ..ops.sorf import rbf_norm_constant
            from ..ops.conv import (_num_kmers, SCALING_SQRT,
                                    SCALING_FULL)
            base = rbf_norm_constant(num_freqs, fit_intercept=False)
            nk = _num_kmers(seq_len, width)
            if scaling == SCALING_SQRT:
                row_scale = base / jnp.sqrt(nk.astype(c.dtype))
            elif scaling == SCALING_FULL:
                row_scale = base / nk.astype(c.dtype)
            else:
                row_scale = jnp.full((x.shape[0],), base, c.dtype)
            return c * row_scale[:, None], s * row_scale[:, None]

        def fn(params, x, seq_len):
            from ..ops.pallas.conv_pallas import conv_parts_shapes_ok
            nw = x.shape[1] - width + 1
            supported = pallas_ok and x.ndim == 3 and \
                conv_parts_shapes_ok(nw, width * x.shape[2], num_freqs,
                                     x.dtype)
            if pallas_ok and not supported:
                from ..utils.fallback import note_fallback
                note_fallback(
                    "conv window loop",
                    f"windows={nw} w*d={width * x.shape[-1]} "
                    f"F={num_freqs} dtype={x.dtype}")
            if supported:
                from ..ops.sincos import _POLY_ARG_LIMIT
                # max|arg| <= sigma * max_row ||x_row||_F * max_col
                # ||proj_col|| (a window is a sub-slice of its row).
                row_n = jnp.sqrt(jnp.max(jnp.sum(
                    x.astype(jnp.float32) ** 2, axis=(1, 2))))
                pr = params["proj"]
                col_n = jnp.sqrt(jnp.max(jnp.sum(pr * pr, axis=0)))
                in_range = params["sigma"] * row_n * col_n < \
                    jnp.asarray(_POLY_ARG_LIMIT, jnp.float32)
                c, s = jax.lax.cond(in_range, pallas_parts, xla_parts,
                                    x, seq_len, params)
            else:
                c, s = xla_parts(x, seq_len, params)
            if intercept:
                c = c.at[:, 0].set(1.0)
            return c, s
        self._parts_fn = (key, fn)
        return fn


def _require_conv_width(parms):
    if "conv_width" not in parms:
        raise ValueError(
            "Sequence kernels need kernel_settings to supply 'conv_width' "
            "(the k-mer window length); none was given.")


class Conv1dRBF(ConvKernelBaseclass):
    def __init__(self, xdim, num_rffs, random_seed=123, device=None,
                 double_precision=False, kernel_spec_parms=None):
        parms = kernel_spec_parms or {}
        _require_conv_width(parms)
        super().__init__(xdim, num_rffs, random_seed, double_precision,
                         parms["conv_width"], parms)
        self.hyperparams = np.ones((2,))
        self.bounds = np.asarray([[1e-3, 5], [1e-6, 1e2]])


class Conv1dMatern(ConvKernelBaseclass):
    def __init__(self, xdim, num_rffs, random_seed=123, device=None,
                 double_precision=False, kernel_spec_parms=None):
        parms = kernel_spec_parms or {}
        _require_conv_width(parms)
        super().__init__(xdim, num_rffs, random_seed, double_precision,
                         parms["conv_width"], parms)
        if "matern_nu" not in parms:
            raise ValueError("Conv1dMatern requires 'matern_nu'.")
        self.matern_nu = float(parms["matern_nu"])
        if not 0.5 <= self.matern_nu <= 2.5:
            raise ValueError("matern_nu is only supported on [0.5, 2.5].")
        modifier = state_rng.matern_chi_modifier(
            random_seed, self.num_freqs, self.matern_nu, self._chi_np.dtype)
        self._chi_np = self._chi_np / modifier
        self.chi_arr = jnp.asarray(self._chi_np)
        self.hyperparams = np.ones((2,))
        self.bounds = np.asarray([[1e-3, 5], [1e-6, 1e2]])


class Conv1dCauchy(ConvKernelBaseclass):
    def __init__(self, xdim, num_rffs, random_seed=123, device=None,
                 double_precision=False, kernel_spec_parms=None):
        parms = kernel_spec_parms or {}
        _require_conv_width(parms)
        super().__init__(xdim, num_rffs, random_seed, double_precision,
                         parms["conv_width"], parms)
        modifier = state_rng.cauchy_chi_modifier(
            random_seed, self.num_freqs, self._chi_np.dtype)
        self._chi_np = self._chi_np * modifier
        self.chi_arr = jnp.asarray(self._chi_np)
        self.hyperparams = np.ones((2,))
        self.bounds = np.asarray([[1e-3, 5], [1e-6, 1e2]])


class GraphRBF(ConvKernelBaseclass):
    """Node-set kernel: conv_width fixed to 1 (graph_rbf.py:42-48)."""

    def __init__(self, xdim, num_rffs, random_seed=123, device=None,
                 double_precision=False, kernel_spec_parms=None):
        super().__init__(xdim, num_rffs, random_seed, double_precision, 1,
                         kernel_spec_parms or {})
        self.hyperparams = np.ones((2,))
        self.bounds = np.asarray([[1e-3, 1e2], [1e-2, 1e2]])


class GraphMatern(ConvKernelBaseclass):
    def __init__(self, xdim, num_rffs, random_seed=123, device=None,
                 double_precision=False, kernel_spec_parms=None):
        parms = kernel_spec_parms or {}
        super().__init__(xdim, num_rffs, random_seed, double_precision, 1,
                         parms)
        if "matern_nu" not in parms:
            raise ValueError("GraphMatern requires 'matern_nu'.")
        self.matern_nu = float(parms["matern_nu"])
        if not 0.5 <= self.matern_nu <= 2.5:
            raise ValueError("matern_nu is only supported on [0.5, 2.5].")
        modifier = state_rng.matern_chi_modifier(
            random_seed, self.num_freqs, self.matern_nu, self._chi_np.dtype)
        self._chi_np = self._chi_np / modifier
        self.chi_arr = jnp.asarray(self._chi_np)
        self.hyperparams = np.ones((2,))
        self.bounds = np.asarray([[1e-3, 1e2], [1e-2, 1e2]])


class GraphCauchy(ConvKernelBaseclass):
    def __init__(self, xdim, num_rffs, random_seed=123, device=None,
                 double_precision=False, kernel_spec_parms=None):
        parms = kernel_spec_parms or {}
        super().__init__(xdim, num_rffs, random_seed, double_precision, 1,
                         parms)
        modifier = state_rng.cauchy_chi_modifier(
            random_seed, self.num_freqs, self._chi_np.dtype)
        self._chi_np = self._chi_np * modifier
        self.chi_arr = jnp.asarray(self._chi_np)
        self.hyperparams = np.ones((2,))
        self.bounds = np.asarray([[1e-3, 1e2], [1e-2, 1e2]])
