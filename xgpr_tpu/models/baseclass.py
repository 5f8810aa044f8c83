"""Shared model state machine.

Parity: /root/reference/src/xGPR/model_baseclass.py -- kernel initialisation
through the registry, preconditioner build + rank autoselection
(:376-476), property setters that invalidate weights (:523-601).
"""
import copy

import numpy as np

from ..kernels import KERNEL_NAME_TO_CLASS
from .. import constants
from ..fitting.engine import Engine
from ..preconditioners.nystrom import NystromPreconditioner, srht_ratio_check


class ModelBaseclass:
    """Base class for the regression / classification models."""

    def __init__(self, num_rffs=256, variance_rffs=16, kernel_choice="RBF",
                 device=None, kernel_settings=None, verbose=True,
                 random_seed=123):
        if kernel_settings is None:
            kernel_settings = dict(constants.DEFAULT_KERNEL_SPEC_PARMS)
        if not isinstance(kernel_settings, dict):
            raise RuntimeError("Pass kernel_settings as a dict of option name -> value.")
        self._kernel_choice = None
        self.kernel = None
        self.weights = None
        self.var = None
        self.trainy_mean = 0.0
        self.trainy_std = 1.0
        self.kernel_choice = kernel_choice
        self._num_rffs = num_rffs
        self._variance_rffs = 0
        self.variance_rffs = variance_rffs
        self.kernel_spec_parms = kernel_settings
        self.verbose = verbose
        self.is_regression = True
        self._double_precision_fht = False
        self.exact_var_calculation = True
        self._random_seed = random_seed
        self.n_classes = 1
        self.gamma = None
        self._engines = {}
        self._nmll_rank_cache = None
        self._device = None
        if device is not None:
            self.device = device

    # ------------------------------------------------------------------
    @staticmethod
    def _dataset_token(dataset):
        """Cache key for a dataset: the never-recycled uid where the
        dataset provides one (all built-in datasets do), falling back to
        id() + shape for user subclasses that bypass the baseclass
        constructor."""
        get_uid = getattr(dataset, "get_uid", None)
        if get_uid is not None:
            return ("uid", get_uid())
        return ("id", id(dataset), dataset.get_ndatapoints(),
                tuple(dataset.get_xdim()))

    def _engine(self, dataset):
        """Cached Engine per (dataset, kernel) pair; hyperparameters flow
        through feature_params at reduction time so reuse is safe.  When
        multiple accelerator devices are visible (config.should_shard),
        the sharded shard_map+psum engine is used transparently."""
        from .. import config as _config
        # config epoch in the key: engine choice depends on config state
        # (engine mode, stacked limit), so a mode switch mid-session must
        # rebuild rather than reuse an engine of the old kind.
        key = (self._dataset_token(dataset), self.kernel.get_uid(),
               _config.config_epoch())
        engine = self._engines.get(key)
        if engine is None:
            # Release any stale engine BEFORE building the replacement:
            # a stacked engine pins a device-resident dataset copy, and
            # holding old + new simultaneously would double peak device
            # memory exactly when the dataset is largest.
            self._engines = {}
            import numpy as _np
            import jax as _jax
            n_elements = int(_np.prod(dataset.get_xdim()))
            # A stacked engine holds each host's shard in that host's
            # LOCAL devices, so the binding capacity is per-host, not
            # the device total across hosts.
            load = n_elements / (_config.stacked_element_limit()
                                 * max(1, _jax.local_device_count()))
            if _jax.process_count() > 1:
                # Per-host datasets may be unequal (ragged splits): every
                # host must make the SAME stacked-vs-streaming choice or
                # their metadata collectives diverge and the job hangs.
                # Agree on the worst-loaded host before deciding.
                from ..parallel.distributed import global_host_reduce
                load = global_host_reduce([load], ["max"])[0]
            fits = load < 1.0
            if _config.should_shard():
                if fits:
                    from ..parallel.sharded import ShardedEngine
                    engine = ShardedEngine(self.kernel, dataset)
                else:
                    # Dataset exceeds aggregate device memory: stream
                    # superbatches through the same shard_map programs.
                    from ..parallel.streaming import StreamingShardedEngine
                    engine = StreamingShardedEngine(self.kernel, dataset)
            elif not fits and _jax.process_count() == 1 \
                    and _config.engine_mode() != "single":
                # Single-device out-of-core: same superbatch machinery on
                # a 1-device mesh, so one chip gets scanned multi-chunk
                # dispatches (fewer per-call latencies) and the one-deep
                # host->device prefetch that overlaps transfer with
                # compute, instead of a synchronous per-chunk loop.
                # (engine_mode "single" opts out: config promises it
                # never routes through shard_map programs.)
                from ..parallel.mesh import data_mesh
                from ..parallel.streaming import StreamingShardedEngine
                engine = StreamingShardedEngine(
                    self.kernel, dataset,
                    mesh=data_mesh(n_devices=1))
            else:
                engine = Engine(self.kernel, dataset)
            self._engines = {key: engine}  # keep at most one
        return engine

    # ------------------------------------------------------------------
    @staticmethod
    def _bucket_sequence_axis(input_x, multiple=32):
        """Pad 3-d input's sequence axis up to a bucket size so repeated
        predict calls with varying L reuse one compiled program.  Extra
        windows fall beyond every row's sequence_length and are masked
        out, so features are unchanged (SURVEY.md section 5: bucketing +
        masking keeps shapes static for XLA)."""
        if input_x.ndim != 3:
            return input_x
        import numpy as np
        l = input_x.shape[1]
        bucket = ((l + multiple - 1) // multiple) * multiple
        if bucket == l:
            return input_x
        pad = np.zeros((input_x.shape[0], bucket - l, input_x.shape[2]),
                       dtype=input_x.dtype)
        return np.concatenate([np.asarray(input_x), pad], axis=1)

    def _pad_and_chunk(self, input_x, sequence_lengths, chunk_size):
        """Pad rows to a chunk multiple and reshape to (B, chunk, ...)
        device arrays for the single-dispatch scanned predict paths.
        Padded rows produce garbage predictions that callers slice off;
        padded sequence lengths reuse the max real length so conv
        scaling stays finite.  Returns (x_chunks, slen_chunks, n)."""
        import jax.numpy as jnp
        n = input_x.shape[0]
        pad = (-n) % chunk_size
        xp = np.asarray(input_x)
        if pad:
            xp = np.concatenate(
                [xp, np.zeros((pad,) + xp.shape[1:], xp.dtype)])
        xc = self.kernel._cast_input(xp).reshape(
            (-1, chunk_size) + xp.shape[1:])
        if sequence_lengths is None:
            slen = jnp.ones(xc.shape[:2], jnp.int32) * \
                (xp.shape[1] if xp.ndim == 3 else 1)
        else:
            sl = np.asarray(sequence_lengths, np.int32)
            if pad:
                sl = np.concatenate(
                    [sl, np.full((pad,), max(1, int(sl.max())),
                                 np.int32)])
            slen = jnp.asarray(sl.reshape(-1, chunk_size))
        return xc, slen, n

    @staticmethod
    def _resolve_accelerator(value):
        """Pick the accelerator device for a 'cuda'/'gpu'/'tpu' request,
        warning when the visible platform differs from the request."""
        import jax
        accel = [d for d in jax.devices() if d.platform != "cpu"]
        if not accel:
            raise RuntimeError(
                "You have specified an accelerator device but no "
                "accelerator is visible to JAX. Currently CPU-only "
                "fitting is available.")
        dev = accel[0]
        requested = "gpu" if value == "cuda" else value
        if dev.platform != requested:
            import warnings
            warnings.warn(
                f"Requested device '{value}' but the visible "
                f"accelerator is '{dev.platform}'; running on "
                f"{dev.platform}.", UserWarning)
        return dev

    def pre_prediction_checks(self, input_x, sequence_lengths, get_var):
        if self.kernel is None or self.weights is None:
            raise RuntimeError("No fitted weights present; call fit() first.")
        if not self.kernel.validate_new_datapoints(input_x):
            raise RuntimeError("Input array shape does not match the shape this model was fitted for.")
        if sequence_lengths is None:
            if input_x.ndim != 2:
                raise RuntimeError("sequence_lengths is required if using a "
                                   "convolution kernel.")
        elif input_x.ndim == 2:
            raise RuntimeError("Fixed-vector kernels take no "
                               "sequence_lengths argument; pass None.")
        if self.weights.shape[0] != self.kernel.get_num_rffs():
            raise RuntimeError(
                f"Fitted weights cover {self.weights.shape[0]} features but "
                f"the kernel now produces {self.kernel.get_num_rffs()}; "
                "refit after changing the feature count.")
        if self.var is None and get_var:
            raise RuntimeError("Variance was requested but suppress_var was "
                               "selected when fitting.")

    def set_hyperparams(self, hyperparams=None, dataset=None, xdim=None):
        """Set hyperparams (log-space), initialising the kernel if needed."""
        if self.kernel is None:
            self._initialize_kernel(dataset, xdim, hyperparams=hyperparams)
        elif hyperparams is not None:
            self.kernel.check_hyperparams(hyperparams)
            self.kernel.set_hyperparams(hyperparams, logspace=True)
        self.weights = None
        self.gamma = None
        self.var = None

    def get_hyperparams(self):
        if self.kernel is None:
            return None
        return self.kernel.get_hyperparams()

    def build_preconditioner(self, dataset, max_rank=512, method="srht"):
        """Build a Nystrom preconditioner; returns (precond, ratio)."""
        self._run_pre_fitting_prep(dataset, max_rank)
        engine = self._engine(dataset)
        precond = NystromPreconditioner(engine, max_rank, self.verbose,
                                        self.random_seed, method,
                                        is_regression=self.is_regression)
        return precond, precond.achieved_ratio

    # ------------------------------------------------------------------
    def _initialize_kernel(self, dataset=None, xdim=None, hyperparams=None,
                           bounds=None):
        if self.kernel_choice not in KERNEL_NAME_TO_CLASS:
            raise RuntimeError("kernel_choice does not name a registered kernel.")
        if dataset is not None:
            input_xdim = dataset.get_xdim()
        elif xdim is not None:
            input_xdim = xdim
        else:
            raise RuntimeError("Kernel construction needs input dimensions: pass a dataset or an xdim tuple.")

        self.kernel = KERNEL_NAME_TO_CLASS[self.kernel_choice](
            input_xdim, self.num_rffs, self.random_seed, None,
            self.double_precision_fht,
            kernel_spec_parms=self.kernel_spec_parms)

        # Some kernels (Linear) set num_rffs themselves.
        self._num_rffs = self.kernel.get_num_rffs()
        if self.variance_rffs >= self.num_rffs and self.is_regression:
            raise RuntimeError("variance_rffs cannot reach num_rffs; shrink it.")
        if bounds is not None:
            self.kernel.set_bounds(bounds)
        if hyperparams is not None:
            self.kernel.check_hyperparams(hyperparams)
            self.kernel.set_hyperparams(hyperparams, logspace=True)
        self.weights, self.var = None, None
        self._engines = {}
        self._nmll_rank_cache = None

    def _run_pre_nmll_prep(self, dataset, bounds=None):
        if self.kernel is None:
            self._initialize_kernel(dataset, bounds=bounds)
        self.weights, self.var = None, None
        return self.kernel.get_bounds()

    def _run_singlepoint_nmll_prep(self, dataset, exact_method=False):
        if self.kernel is None:
            self._initialize_kernel(dataset)
        self.weights, self.var = None, None
        if self.num_rffs <= 2:
            raise RuntimeError("Tuning with num_rffs <= 2 cannot distinguish hyperparameters; raise num_rffs.")
        if exact_method and \
                self.kernel.get_num_rffs() > constants.MAX_CLOSED_FORM_RFFS:
            raise RuntimeError(
                f"At most {constants.MAX_CLOSED_FORM_RFFS} rffs can be used "
                "for exact-NMLL tuning; use approximate NMLL instead.")

    def _run_pre_fitting_prep(self, dataset, max_rank=None):
        self.trainy_mean = dataset.get_ymean()
        self.trainy_std = dataset.get_ystd()
        if self.kernel is None:
            self._initialize_kernel(dataset)
        if self.variance_rffs > self.kernel.get_num_rffs():
            raise RuntimeError(
                f"variance_rffs ({self.variance_rffs}) cannot exceed the "
                f"kernel's feature count ({self.kernel.get_num_rffs()}).")
        if max_rank is not None:
            if max_rank < 1:
                raise RuntimeError("Invalid value for max_rank.")
            if max_rank >= self.kernel.get_num_rffs():
                raise RuntimeError("max_rank cannot reach num_rffs.")

    # ------------------------------------------------------------------
    def _autoselect_preconditioner(self, dataset, min_rank=512,
                                   max_rank=3000, increment_size=512,
                                   always_use_srht2=False,
                                   ratio_target=30.):
        """Pick a Nystrom rank whose estimated min-eig/lambda^2 ratio
        predicts a fast CG fit, then build the preconditioner.

        Role parity with the reference's rank-autoselect
        (model_baseclass.py:376-434): walk a ladder of candidate ranks,
        stopping at the first whose sampled ratio estimate
        (:_check_rank_ratio) clears ``ratio_target``.  If the ladder is
        exhausted, fall back to the largest admissible rank and upgrade
        to the two-pass srht_2 construction, which extracts more from
        the same rank at roughly double the build cost.
        """
        rank_cap = min(max_rank, self.kernel.get_num_rffs() - 1)
        # Small datasets are cheap to sketch exactly; larger ones are
        # probed with a 20% row sample.
        sample_frac = 1.0 if dataset.get_ndatapoints() < 5000 else 0.2

        chosen_rank, method = rank_cap, "srht_2"
        if min_rank >= rank_cap:
            # num_rffs so small that the ladder has nowhere to go --
            # a capped single-pass build is always adequate there.
            chosen_rank, method = rank_cap, "srht"
        else:
            ladder = range(min_rank, rank_cap, increment_size)
            for candidate in ladder:
                est = self._check_rank_ratio(dataset, sample_frac,
                                             candidate)
                if est <= ratio_target:
                    chosen_rank, method = candidate, "srht"
                    break

        if always_use_srht2:
            method = "srht_2"
        if self.verbose:
            print(f"Preconditioner rank {chosen_rank} ({method}).")
        engine = self._engine(dataset)
        return NystromPreconditioner(engine, chosen_rank, self.verbose,
                                     self.random_seed, method,
                                     is_regression=self.is_regression)

    def _amortized_nmll_preconditioner(self, dataset, ratio_target=30.):
        """Preconditioner for repeated approximate-NMLL evaluations.

        The reference re-runs the full rank autoselection (1-5 sampled
        sketch dataset passes, xgp_regression.py:330-333 ->
        model_baseclass.py:376-434) on EVERY cost-function call inside
        scipy.optimize.  Successive tuner iterates move hyperparameters
        slowly, so the selected rank is nearly always the same; we cache
        it.  On cache hits we skip the sampled check passes and build the
        srht_2 preconditioner directly at the cached rank, using the
        build's own ``achieved_ratio`` (exact, computed from eigenvalues
        we already have) as the verification -- growing the rank by 512
        and rebuilding until the target is met or the hard cap is reached
        (matching the reference autoselect's escalation to max_rank,
        model_baseclass.py:376-434).  The cache is keyed on the dataset's
        identity so switching datasets between calls falls back to the
        full autoselect rather than reusing a rank picked for different
        data.  Net effect: ~3 dataset passes per NMLL evaluation instead
        of ~4-7, and no freshly compiled sketch programs at intermediate
        ranks mid-tune.
        """
        num_rffs = self.kernel.get_num_rffs()
        hard_cap = min(constants.LARGEST_NMLL_MAX_RANK, num_rffs - 1)
        ds_token = self._dataset_token(dataset)
        cached = self._nmll_rank_cache
        if cached is not None and cached[0] != ds_token:
            cached = None
        if cached is None:
            precond = self._autoselect_preconditioner(
                dataset, min_rank=constants.SMALLEST_NMLL_MAX_RANK,
                max_rank=constants.LARGEST_NMLL_MAX_RANK,
                always_use_srht2=True, ratio_target=ratio_target)
            self._nmll_rank_cache = (ds_token, precond.get_rank())
            return precond

        engine = self._engine(dataset)
        rank = min(cached[1], hard_cap)
        precond = NystromPreconditioner(engine, rank, self.verbose,
                                        self.random_seed, "srht_2",
                                        is_regression=self.is_regression)
        while precond.achieved_ratio > ratio_target and rank < hard_cap:
            rank = min(rank + 512, hard_cap)
            precond = NystromPreconditioner(engine, rank, self.verbose,
                                            self.random_seed, "srht_2",
                                            is_regression=self.is_regression)
        self._nmll_rank_cache = (ds_token, rank)
        return precond

    def _check_rank_ratio(self, dataset, sample_frac=0.1, max_rank=512):
        """Sampled ratio estimate (model_baseclass.py:438-476).  Caps the
        rff count at 8192 during the check (eigenvalue interlacing)."""
        if sample_frac < 0.01 or sample_frac > 1:
            raise RuntimeError("sample_frac must be in [0.01, 1].")
        num_rffs = copy.deepcopy(self.num_rffs)
        capped = min(self.num_rffs, 8192)
        if capped != num_rffs:
            self.num_rffs = capped
        engine = self._engine(dataset)
        eig = srht_ratio_check(engine, max_rank, self.random_seed,
                               sample_frac=sample_frac)
        ratio = float(eig.min()) / self.kernel.get_lambda() ** 2
        ratio /= sample_frac
        if capped != num_rffs:
            self.num_rffs = num_rffs
        return ratio

    # ------------------------------------------------------------------
    # properties with weight invalidation
    @property
    def kernel_spec_parms(self):
        return self._kernel_spec_parms

    @kernel_spec_parms.setter
    def kernel_spec_parms(self, value):
        """Changing kernel settings invalidates the kernel and weights
        (model_baseclass.py:523-539)."""
        if not isinstance(value, dict):
            raise RuntimeError(
                f"kernel_spec_parms expects a dict of kernel settings; "
                f"got {type(value).__name__}.")
        self._kernel_spec_parms = value
        self.kernel = None
        self.weights = None
        self.gamma = None
        self.var = None
        self._engines = {}

    @property
    def kernel_choice(self):
        return self._kernel_choice

    @kernel_choice.setter
    def kernel_choice(self, value):
        if not isinstance(value, str):
            raise RuntimeError("kernel_choice must be a string.")
        if value not in KERNEL_NAME_TO_CLASS:
            raise RuntimeError("kernel_choice does not name a registered kernel.")
        self._kernel_choice = value
        self.kernel = None
        self.weights = None
        self.gamma = None
        self.var = None

    @property
    def num_rffs(self):
        return self._num_rffs

    @num_rffs.setter
    def num_rffs(self, value):
        self._num_rffs = value
        if self.kernel is not None:
            self._initialize_kernel(
                xdim=self.kernel.get_xdim(),
                hyperparams=self.kernel.get_hyperparams(),
                bounds=self.kernel.get_bounds())
        self.weights = None
        self.gamma = None
        self.var = None

    @property
    def variance_rffs(self):
        return self._variance_rffs

    @variance_rffs.setter
    def variance_rffs(self, value):
        if value > constants.MAX_VARIANCE_RFFS:
            raise RuntimeError(
                f"variance_rffs is capped at {constants.MAX_VARIANCE_RFFS}.")
        if self.kernel is not None and value > self.num_rffs and \
                self.kernel_choice not in ("Linear",):
            raise RuntimeError("variance_rffs cannot exceed num_rffs.")
        self._variance_rffs = value
        if self.var is not None:
            self.weights = None
            self.gamma = None
            self.var = None

    @property
    def double_precision_fht(self):
        return self._double_precision_fht

    @double_precision_fht.setter
    def double_precision_fht(self, value):
        """Run feature generation in float64 (model_baseclass.py:572-584).
        Our kernels snapshot their projection-state dtype at construction,
        so flipping this rebuilds the kernel (hyperparams/bounds kept)."""
        self._double_precision_fht = bool(value)
        if self.kernel is not None:
            self._initialize_kernel(
                xdim=self.kernel.get_xdim(),
                hyperparams=self.kernel.get_hyperparams(),
                bounds=self.kernel.get_bounds())

    @property
    def device(self):
        """Current compute target.  TPU-native semantics: JAX places
        arrays at dispatch, so this reflects (and the setter changes) the
        process-wide default device rather than migrating arrays the way
        the reference's numpy<->cupy setter does
        (model_baseclass.py:605-643)."""
        if self._device is not None:
            return self._device
        import jax
        return jax.default_backend()

    @device.setter
    def device(self, value):
        import jax
        if value not in ("cpu", "cuda", "gpu", "tpu"):
            raise RuntimeError(
                "Device must be in ['cpu', 'cuda', 'gpu', 'tpu'].")
        if value == "cpu":
            dev = jax.devices("cpu")[0]
        else:
            dev = self._resolve_accelerator(value)
        jax.config.update("jax_default_device", dev)
        # Engines hold device-resident stacked data; rebuild on the new
        # target.  weights/var migrate automatically at next dispatch.
        self._engines = {}
        self._device = value

    @property
    def random_seed(self):
        return self._random_seed

    @random_seed.setter
    def random_seed(self, value):
        self._random_seed = value
        if self.kernel is not None:
            self._initialize_kernel(
                xdim=self.kernel.get_xdim(),
                hyperparams=self.kernel.get_hyperparams(),
                bounds=self.kernel.get_bounds())
        self.weights = None
        self.gamma = None
        self.var = None
