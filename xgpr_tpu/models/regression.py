"""Approximate GP regression.

API parity with the reference's xGPRegression
(/root/reference/src/xGPR/xgp_regression.py): predict with variance,
exact & approximate (SLQ) NMLL, exact NMLL gradient, exact / CG fitting and
the crude + scipy.optimize tuning entry points.
"""
import warnings
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from scipy.optimize import minimize

from .baseclass import ModelBaseclass
from .. import config as _cfg
from .. import constants
from ..fitting.cg import cg_fit
from ..fitting.exact import (calc_weights_exact, calc_variance_exact,
                             direct_weight_calc)
from ..preconditioners.nystrom import NystromPreconditioner
from ..scoring.slq import slq_nmll_from_engine
from ..scoring.alpha_beta import optimize_alpha_beta
from ..scoring.gradient import exact_nmll_reg_grad
from ..scoring.lb_optimizer import shared_hparam_search
from ..scoring.surrogate_tuner import surrogate_grid_tuning


class GPRegression(ModelBaseclass):
    """GP regression on random Fourier features."""

    def __init__(self, num_rffs=256, variance_rffs=16, kernel_choice="RBF",
                 device=None, kernel_settings=None, verbose=True,
                 random_seed=123):
        super().__init__(num_rffs, variance_rffs, kernel_choice,
                         device=device, kernel_settings=kernel_settings,
                         verbose=verbose, random_seed=random_seed)

    # ------------------------------------------------------------------
    def _pure_feature_fn_hinted(self, assume_in_range):
        """Kernel feature fn with the trace-time range hint when the
        kernel supports it (hinted fns trace only the fused Pallas map,
        halving fresh-HLO compile cost on predict)."""
        if assume_in_range and hasattr(self.kernel, "poly_range_ok"):
            return self.kernel.pure_feature_fn(assume_in_range=True)
        return self.kernel.pure_feature_fn()

    def _predict_step_fn(self, assume_in_range=False):
        """One fused jit program per chunk: features -> mean (-> variance).
        Cache keyed on the pure fn identities so kernel rebuilds AND
        config-mode switches (set_feature_map_mode etc.) rebuild the
        program instead of reusing a stale one."""
        feature_fn = self._pure_feature_fn_hinted(assume_in_range)
        parts_fn = self.kernel.pure_feature_parts_fn()
        cache = getattr(self, "_predict_step", None)
        if not isinstance(cache, dict):
            cache = {}
            self._predict_step = cache
        cached = cache.get((feature_fn, parts_fn))
        if cached is not None:
            return cached
        positions = self.kernel.feature_positions() if parts_fn else None
        if positions is not None:
            cos_pos = jnp.asarray(positions[0])
            sin_pos = jnp.asarray(positions[1])

        @partial(jax.jit, static_argnames=("get_var",))
        def step(params, x, slen, weights, var_mat, var_idx, lam2,
                 get_var):
            mp = _cfg.matmul_precision()
            if positions is not None and not get_var:
                # Layout-free mean: z @ w == c @ w_cos + s @ w_sin.
                c, s = parts_fn(params, x, slen)
                return (jnp.matmul(c, jnp.take(weights, cos_pos),
                                   precision=mp)
                        + jnp.matmul(s, jnp.take(weights, sin_pos),
                                     precision=mp)), None
            z = feature_fn(params, x, slen)
            mean = jnp.matmul(z, weights, precision=mp)
            if not get_var:
                return mean, None
            zv = jnp.take(z, var_idx, axis=1)
            pv = jnp.matmul(var_mat, zv.T,
                            precision=_cfg.matmul_precision()).T
            pred_var = lam2 + lam2 * jnp.sum(zv * pv, axis=1)
            return mean, pred_var
        if len(cache) > 4:
            cache.clear()
        cache[(feature_fn, parts_fn)] = step
        return step

    def _nystrom_predict_step_fn(self):
        """Fused chunk program for the Nystrom-variance path (Linear
        kernels): features -> mean and lam^2 (1 + z P^{-1} z^T) variance,
        with the preconditioner applied inside jit instead of a host
        dispatch per 2000-row chunk."""
        feature_fn = self.kernel.pure_feature_fn()
        cached = getattr(self, "_nystrom_predict_step", None)
        if cached is not None and cached[0] is feature_fn:
            return cached[1]

        @jax.jit
        def step(params, x, weights, u_mat, inv_eig, prefactor, lam2):
            mp = _cfg.matmul_precision()
            z = feature_fn(params, x, None)
            mean = jnp.matmul(z, weights, precision=mp)
            zt = z.T
            xp = jnp.matmul(u_mat.T, zt, precision=mp)
            pv = (zt - jnp.matmul(u_mat, xp, precision=mp)) + \
                jnp.matmul(u_mat, inv_eig[:, None] * prefactor * xp,
                           precision=mp)
            pred_var = lam2 + lam2 * jnp.sum(z * pv.T, axis=1)
            return mean, pred_var
        self._nystrom_predict_step = (feature_fn, step)
        return step

    def _scanned_predict_fn(self, assume_in_range=False):
        """Whole-input predict as ONE device program: pad rows to a
        chunk multiple and scan the per-chunk step.  One dispatch instead
        of N/chunk_size (dispatch latency dominates chunked predict on
        remote accelerators); compile count stays bounded because rows
        are padded to a chunk multiple."""
        feature_fn = self._pure_feature_fn_hinted(assume_in_range)
        cache = getattr(self, "_scanned_predict", None)
        if not isinstance(cache, dict):
            cache = {}
            self._scanned_predict = cache
        cached = cache.get(feature_fn)
        if cached is not None:
            return cached

        @partial(jax.jit, static_argnames=("get_var",))
        def run(params, x, slen, weights, var_mat, var_idx, lam2,
                get_var):
            mp = _cfg.matmul_precision()

            def body(_, batch):
                xb, lb = batch
                z = feature_fn(params, xb, lb)
                mean = jnp.matmul(z, weights, precision=mp)
                if not get_var:
                    return None, (mean, mean)
                zv = jnp.take(z, var_idx, axis=1)
                pv = jnp.matmul(var_mat, zv.T, precision=mp).T
                pred_var = lam2 + lam2 * jnp.sum(zv * pv, axis=1)
                return None, (mean, pred_var)
            _, (means, variances) = jax.lax.scan(body, None, (x, slen))
            return means.reshape(-1), variances.reshape(-1)
        if len(cache) > 4:
            cache.clear()
        cache[feature_fn] = run
        return run

    def export_predict_fn(self, get_var=False):
        """Export a PURE jittable predict function + state pytree for
        serving (TPU-native addition; no reference analogue).

        Returns (fn, state) where fn(state, x, seq_len_or_None) -> mean
        (or (mean, variance)) with y-denormalisation folded in.  fn is a
        closed-over pure function of arrays only: jit/vmap/shard it, ship
        it through jax AOT export, or stack it into a serving graph
        without the model object.
        """
        if self.kernel is None or self.weights is None:
            raise RuntimeError("No fitted weights present; call fit() first.")
        if get_var and (self.var is None or not self.exact_var_calculation):
            raise RuntimeError(
                "Variance export requires a fitted model with the exact "
                "variance calculation (not the Linear-kernel Nystrom "
                "path).")
        feature_fn = self.kernel.pure_feature_fn()
        dtype = jnp.asarray(self.weights).dtype
        state = {
            "params": self.kernel.feature_params(),
            "weights": jnp.asarray(self.weights),
            "y_mean": jnp.asarray(self.trainy_mean, dtype),
            "y_std": jnp.asarray(self.trainy_std, dtype),
        }
        if get_var:
            state["var_mat"] = jnp.asarray(self.var, dtype)
            state["var_idx"] = jnp.asarray(
                self.kernel.variance_column_indices(self.variance_rffs))
            state["lam2"] = jnp.asarray(
                self.kernel.get_lambda() ** 2, dtype)

        def fn(state, x, seq_len=None):
            mp = _cfg.matmul_precision()
            z = feature_fn(state["params"], x, seq_len)
            mean = jnp.matmul(z, state["weights"], precision=mp) * \
                state["y_std"] + state["y_mean"]
            if not get_var:
                return mean
            zv = jnp.take(z, state["var_idx"], axis=1)
            pv = jnp.matmul(state["var_mat"], zv.T, precision=mp).T
            pred_var = state["lam2"] + state["lam2"] * \
                jnp.sum(zv * pv, axis=1)
            pred_var = jnp.clip(pred_var, min=0.0) * state["y_std"] ** 2
            return mean, pred_var
        return fn, state

    def predict(self, input_x, sequence_lengths=None, get_var=False,
                chunk_size=2000):
        """Posterior mean (and optionally variance) for new datapoints
        (xgp_regression.py:77-145)."""
        self.pre_prediction_checks(input_x, sequence_lengths, get_var)
        input_x = self._bucket_sequence_axis(input_x)
        preds, var = [], []
        lambda_ = self.kernel.get_lambda()
        weights = jnp.asarray(self.weights)
        params = self.kernel.feature_params()
        dtype = weights.dtype

        use_fused = self.exact_var_calculation or not get_var
        # Host-side argument-range check: when the input provably stays
        # inside the polynomial sincos range, the predict programs trace
        # only the fused feature map (no dual-compiled runtime guard).
        range_ok = getattr(self.kernel, "poly_range_ok", None)
        in_range = bool(range_ok(input_x)) if range_ok is not None \
            else False
        step = self._predict_step_fn(in_range) if use_fused else None
        nystrom_step = None if use_fused else self._nystrom_predict_step_fn()
        if use_fused and get_var:
            var_mat = jnp.asarray(self.var, dtype=dtype)
            var_idx = jnp.asarray(self.kernel.variance_column_indices(
                self.variance_rffs))
        else:
            var_mat = jnp.zeros((1, 1), dtype)
            var_idx = jnp.zeros((1,), jnp.int64 if var_mat.dtype ==
                                jnp.float64 else jnp.int32)
        lam2 = jnp.asarray(lambda_ ** 2, dtype)

        # Single-program path: scan the chunks inside ONE jit (one
        # dispatch for the whole call).  Used when the padded input is a
        # moderate device-resident array; the host loop remains for very
        # large inputs and the Nystrom-variance (Linear) path.
        n = input_x.shape[0]
        n_elements = int(np.prod(input_x.shape))
        if use_fused and n > chunk_size and n_elements < 10 ** 8:
            run = self._scanned_predict_fn(in_range)
            xc, slen, n = self._pad_and_chunk(input_x, sequence_lengths,
                                              chunk_size)
            if use_fused and get_var:
                vm, vi = var_mat, var_idx
            else:
                vm = jnp.zeros((1, 1), dtype)
                vi = jnp.zeros((1,), var_idx.dtype)
            means, variances = run(params, xc, slen, weights, vm, vi,
                                   lam2, get_var)
            preds = np.asarray(means)[:n]
            if not get_var:
                return preds * self.trainy_std + self.trainy_mean
            var = np.array(variances)[:n]
            var[var < 0] = 0
            return (preds * self.trainy_std + self.trainy_mean,
                    var * self.trainy_std ** 2)

        for i in range(0, input_x.shape[0], chunk_size):
            cut = min(i + chunk_size, input_x.shape[0])
            slen = None if sequence_lengths is None \
                else jnp.asarray(sequence_lengths[i:cut], jnp.int32)
            xc = self.kernel._cast_input(input_x[i:cut, ...])
            if use_fused:
                mean, pred_var = step(params, xc, slen, weights, var_mat,
                                      var_idx, lam2, get_var)
                preds.append(np.asarray(mean))
                if get_var:
                    var.append(np.asarray(pred_var))
            else:
                # Nystrom-variance path (Linear kernels): one fused jit
                # program per chunk, preconditioner applied inside.
                mean, pred_var = nystrom_step(
                    params, xc, weights, self.var.u_mat, self.var.inv_eig,
                    jnp.asarray(self.var.prefactor, dtype), lam2)
                preds.append(np.asarray(mean))
                var.append(np.asarray(pred_var))

        preds = np.concatenate(preds)
        if not get_var:
            return preds * self.trainy_std + self.trainy_mean
        var = np.concatenate(var)
        var[var < 0] = 0
        return (preds * self.trainy_std + self.trainy_mean,
                var * self.trainy_std ** 2)

    # ------------------------------------------------------------------
    def exact_nmll(self, hyperparams, dataset):
        """Exact NMLL via design-matrix Cholesky
        (xgp_regression.py:152-205)."""
        self._run_singlepoint_nmll_prep(dataset, exact_method=True)
        self.kernel.set_hyperparams(hyperparams, logspace=True)
        ndatapoints = dataset.get_ndatapoints()
        engine = self._engine(dataset)
        z_trans_z, z_trans_y, y_trans_y = engine.design_mat()
        try:
            chol, weights = direct_weight_calc(z_trans_z, z_trans_y,
                                               self.kernel.get_lambda())
        except Exception:
            warnings.warn("Design matrix is numerically singular at "
                          f"{hyperparams}; returning the penalty score.")
            return constants.DEFAULT_SCORE_IF_PROBLEM

        nll1 = float(0.5 * (y_trans_y - z_trans_y @ weights))
        # chol may be a host-fp64 factor (see direct_weight_calc); sum
        # its log-diagonal on host rather than round-tripping the full
        # (M, M) factor through a slow device link.
        nll2 = float(np.sum(np.log(np.diagonal(np.asarray(chol)))))
        negloglik, _ = optimize_alpha_beta(
            self.kernel.get_lambda(), np.array([nll1, nll2]), ndatapoints,
            self.kernel.get_num_rffs())
        if np.isnan(negloglik):
            warnings.warn("Design matrix is numerically singular at "
                          f"{hyperparams}; returning the penalty score.")
            return constants.DEFAULT_SCORE_IF_PROBLEM
        if self.verbose:
            print("Evaluated NMLL.")
        return negloglik

    def exact_nmll_gradient(self, hyperparams, dataset, subsample=1.0):
        """NMLL and its gradient (xgp_regression.py:209-260)."""
        self._run_singlepoint_nmll_prep(dataset, exact_method=True)
        init_hparams = self.kernel.get_hyperparams()
        self.kernel.set_hyperparams(hyperparams, logspace=True)
        hparams = self.kernel.get_hyperparams(logspace=False)
        if self.verbose:
            print("Evaluating gradient...")

        engine = self._engine(dataset)
        ztz, zty, yty, dz_ty, inner, nsamples = \
            engine.gradient_terms(subsample=subsample)
        try:
            negloglik, grad, _ = exact_nmll_reg_grad(
                ztz, zty, yty, hparams, nsamples, dz_ty, inner)
        except Exception:
            return (constants.DEFAULT_SCORE_IF_PROBLEM,
                    hyperparams - init_hparams)
        if np.isnan(negloglik):
            return (constants.DEFAULT_SCORE_IF_PROBLEM,
                    hyperparams - init_hparams)
        return float(negloglik), grad

    def approximate_nmll(self, hyperparams, dataset, manual_settings=None):
        """SLQ-approximated NMLL (xgp_regression.py:264-377).

        Degenerate hyperparameter points (singular sketches, CG/SLQ
        breakdown) return DEFAULT_SCORE_IF_PROBLEM instead of raising, so
        one bad iterate cannot kill a long scipy.optimize tune -- matching
        the exact path's graceful degradation (xgp_regression.py:182-201).
        """
        self._run_singlepoint_nmll_prep(dataset, exact_method=False)
        self.kernel.set_hyperparams(hyperparams, logspace=True)
        if self.verbose:
            print("Now building preconditioner...")
        try:
            negloglik = self._approximate_nmll_inner(dataset,
                                                     manual_settings)
        except Exception:
            warnings.warn("Numerical failure encountered when calculating "
                          f"approximate NMLL for {hyperparams}.")
            self._nmll_rank_cache = None
            return constants.DEFAULT_SCORE_IF_PROBLEM
        if not np.isfinite(negloglik):
            warnings.warn("Non-finite approximate NMLL encountered for "
                          f"{hyperparams}.")
            return constants.DEFAULT_SCORE_IF_PROBLEM
        if self.verbose:
            print("NMLL evaluation completed.")
        return negloglik

    def _approximate_nmll_inner(self, dataset, manual_settings=None):
        settings = dict(constants.DEFAULT_NMLL_PARAMS)
        engine = self._engine(dataset)
        if manual_settings is not None:
            for key in settings:
                if key in manual_settings:
                    settings[key] = manual_settings[key]
            if settings["max_rank"] >= self.num_rffs:
                settings["max_rank"] = self.num_rffs - 1
            preconditioner = NystromPreconditioner(
                engine, settings["max_rank"], False, self.random_seed,
                settings["preconditioner_mode"])
        else:
            preconditioner = self._amortized_nmll_preconditioner(dataset)
            engine = self._engine(dataset)

        if self.verbose:
            print("Now fitting...")

        return slq_nmll_from_engine(
            engine, preconditioner, self.random_seed,
            settings["nsamples"], settings["nmll_iter"],
            settings["nmll_tol"])

    # ------------------------------------------------------------------
    def fit(self, dataset, preconditioner=None, tol=1e-6, max_iter=500,
            mode="cg", suppress_var=False, max_rank=3000, min_rank=512,
            autoselect_target_ratio=30., always_use_srht2=False,
            run_diagnostics=False):
        """Fit the model (xgp_regression.py:381-486)."""
        from ..utils.diagnostics import PhaseTimes, phase_timer, block
        self._run_pre_fitting_prep(dataset)
        self.weights, self.var = None, None
        self.exact_var_calculation = True
        if self.verbose:
            print("starting fitting")
        times = PhaseTimes()
        with phase_timer(times, "engine_build"):
            engine = self._engine(dataset)

        if mode == "exact":
            if self.kernel.get_num_rffs() > constants.MAX_CLOSED_FORM_RFFS:
                raise RuntimeError(
                    "Closed-form ('exact') fitting is capped at "
                    f"{constants.MAX_CLOSED_FORM_RFFS} rffs; this kernel "
                    f"produces {self.kernel.get_num_rffs()}. Use mode='cg' "
                    "or lower num_rffs.")
            with phase_timer(times, "exact_solve"):
                self.weights, n_iter, losses = calc_weights_exact(engine)
                block(self.weights)
        elif mode == "cg":
            if preconditioner is None:
                with phase_timer(times, "preconditioner"):
                    preconditioner = self._autoselect_preconditioner(
                        dataset, min_rank=min_rank, max_rank=max_rank,
                        ratio_target=autoselect_target_ratio,
                        always_use_srht2=always_use_srht2)
            with phase_timer(times, "cg"):
                self.weights, n_iter, losses = cg_fit(
                    engine, preconditioner, tol, max_iter, self.verbose)
                block(self.weights)
        else:
            raise RuntimeError(
                f"Unknown fit mode {mode!r}; valid choices are 'cg' "
                "and 'exact'.")

        if not suppress_var:
            if self.verbose:
                print("Now performing variance calculations...")
            with phase_timer(times, "variance"):
                if "Linear" in self.kernel_choice:
                    self.var = NystromPreconditioner(
                        engine, self.variance_rffs, False,
                        self.random_seed, "srht")
                    self.exact_var_calculation = False
                else:
                    self.var = calc_variance_exact(engine,
                                                   self.variance_rffs)
                    block(self.var)

        self.fit_phase_times = times
        if self.verbose:
            print("Fitting complete.")
            print(times.report())
        if run_diagnostics:
            return n_iter, losses

    # ------------------------------------------------------------------
    def tune_hyperparams_crude(self, dataset, bounds=None, random_seed=123,
                               max_bayes_iter=30, subsample=1.0):
        """Crude (exact-NMLL, closed-form-lambda) tuner
        (xgp_regression.py:497-561)."""
        if subsample < 0.01 or subsample > 1:
            raise RuntimeError("subsample is a row fraction and must lie in [0.01, 1].")
        optim_bounds = self._run_pre_nmll_prep(dataset, bounds)
        num_hparams = self.kernel.get_hyperparams().shape[0]
        engine_factory = lambda: self._engine(dataset)

        if num_hparams == 1:
            best_score, hyperparams = shared_hparam_search(
                np.array([]), self.kernel, engine_factory, optim_bounds,
                subsample=subsample)
            n_feval = 1
        elif 1 < num_hparams < 4:
            hyperparams, _, best_score, n_feval = surrogate_grid_tuning(
                self.kernel, engine_factory, optim_bounds, random_seed,
                max_bayes_iter, self.verbose, subsample=subsample)
        else:
            raise RuntimeError(
                "Crude tuning covers kernels carrying one to three "
                f"hyperparameters; this kernel has {num_hparams}.")

        self.kernel.set_hyperparams(hyperparams, logspace=True)
        return hyperparams, n_feval, best_score

    # scipy.optimize option recipes per supported tuning method; the
    # gradient flag marks methods whose cost function returns (f, grad).
    _TUNER_RECIPES = {
        "Powell": (lambda max_iter, tol:
                   {"maxfev": max_iter, "xtol": 1e-1, "ftol": tol}, False),
        "Nelder-Mead": (lambda max_iter, tol:
                        {"maxfev": max_iter, "fatol": tol}, False),
        "L-BFGS-B": (lambda max_iter, tol:
                     {"maxiter": max_iter, "ftol": tol}, True),
    }

    def _tuning_start_point(self, starting_hyperparams, optim_bounds):
        """Resolve/validate the optimizer's x0 inside the search box."""
        current = self.kernel.get_hyperparams()
        if starting_hyperparams is not None:
            x0 = np.asarray(starting_hyperparams, dtype=np.float64)
            if x0.ndim != 1 or x0.shape[0] != current.shape[0]:
                raise RuntimeError(
                    "starting_hyperparams must be a 1d array with one "
                    "entry per kernel hyperparameter "
                    f"({current.shape[0]} here).")
            return x0
        inside = np.all(current >= optim_bounds[:, 0]) and \
            np.all(current <= optim_bounds[:, 1])
        if inside:
            return current
        warnings.warn(
            "Current kernel hyperparameters sit outside the search box; "
            "restarting the optimizer from the box's midpoint instead.",
            UserWarning)
        return optim_bounds.mean(axis=1)

    def tune_hyperparams(self, dataset, bounds=None, max_iter=50,
                         tuning_method="Powell", starting_hyperparams=None,
                         tol=1e-2, n_restarts=1, nmll_method="exact",
                         manual_settings=None):
        """Tune hyperparameters by handing an NMLL cost function to
        scipy.optimize.minimize, with optional random restarts.

        Role parity with the reference's scipy-wrapper tuner
        (xgp_regression.py:564-707): Powell / Nelder-Mead on either NMLL
        flavour, L-BFGS-B on the exact NMLL with its analytic gradient.
        """
        if tuning_method not in self._TUNER_RECIPES:
            raise RuntimeError(
                f"Unknown tuning_method {tuning_method!r}; choose one of "
                f"{sorted(self._TUNER_RECIPES)}.")
        make_options, uses_gradient = self._TUNER_RECIPES[tuning_method]

        if nmll_method == "exact":
            cost_fun = self.exact_nmll_gradient if uses_gradient \
                else self.exact_nmll
            args = (dataset,)
        elif nmll_method == "approximate":
            if uses_gradient:
                raise RuntimeError(
                    "The SLQ-approximated NMLL has no gradient, so it "
                    "cannot drive L-BFGS-B; pick Powell or Nelder-Mead, "
                    "or use nmll_method='exact'.")
            cost_fun = self.approximate_nmll
            args = (dataset, manual_settings)
        else:
            raise RuntimeError(
                f"Unknown nmll_method {nmll_method!r}; choose 'exact' or "
                "'approximate'.")

        optim_bounds = self._run_pre_nmll_prep(dataset, bounds)
        x0 = self._tuning_start_point(starting_hyperparams, optim_bounds)
        restart_rng = np.random.default_rng(self.random_seed)

        best_score, hyperparams, n_feval = np.inf, None, 0
        for _ in range(n_restarts):
            res = minimize(cost_fun, x0=x0, args=args,
                           method=tuning_method,
                           options=make_options(max_iter, tol),
                           bounds=[tuple(row) for row in optim_bounds],
                           jac=True if uses_gradient else None)
            n_feval += res.nfev
            if res.fun < best_score:
                best_score, hyperparams = res.fun, res.x
            if self.verbose:
                print(f"Restart done; best NMLL so far {best_score}.")
            x0 = restart_rng.uniform(optim_bounds[:, 0],
                                     optim_bounds[:, 1])

        self.kernel.set_hyperparams(hyperparams, logspace=True)
        return hyperparams, n_feval, best_score
