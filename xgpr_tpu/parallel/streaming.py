"""Out-of-core streaming on a device mesh.

The reference scales to arbitrary dataset size by streaming npy chunks
through every reduction (offline_data_handling.py:73-108,
cg_tools.py:26-53) -- on one device.  ``StreamingShardedEngine`` is the
TPU-native generalisation: datasets larger than aggregate device memory
stream through the SAME shard_map reduction programs as the
device-resident ``ShardedEngine``, fed superbatch-by-superbatch.

A superbatch is (batches_per_step x n_devices) padded chunks assembled on
host and placed with a batch-axis NamedSharding, so each device receives
batches_per_step chunks per program call.  The host->device transfer of
superbatch k+1 is issued BEFORE superbatch k's reduction is consumed
(one-deep prefetch); since JAX dispatch is asynchronous, the copy of the
next superbatch overlaps the compute of the current one -- the TPU
equivalent of the reference's prefetching npy loader (native/npy_stream).

CG on a streaming engine re-streams the dataset every iteration, exactly
like the reference's per-iteration chunk loop (cg_tools.py:26-53); the
single-dispatch fused while_loop solver requires device-resident data and
is gated off by fitting/cg.py.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS
from .sharded import ShardedEngine
from .. import config


class StreamingShardedEngine(ShardedEngine):
    """ShardedEngine whose data streams from the dataset per reduction.

    Every reduction pass re-reads the dataset (disk-backed OfflineDataset
    or in-memory OnlineDataset) in deterministic chunk order, so results
    are exactly reproducible pass to pass and identical to the stacked
    engine's up to fp summation order.

    Multi-host: each process streams its LOCAL dataset; every program
    call is a collective, so all hosts must iterate the same number of
    superbatch steps -- hold equal local padded-batch counts per host
    (the same balanced-sharding requirement as the stacked engine).
    """

    def __init__(self, kernel, dataset, mesh=None, batches_per_step=4):
        self.batches_per_step = int(batches_per_step)
        super().__init__(kernel, dataset, mesh)

    # ------------------------------------------------------------------
    def _build_stack(self):
        """No device-resident stack: record superbatch geometry only."""
        self._x = None
        self._y = None
        self._l = None
        self._m = None
        local_dev = jax.local_device_count() if jax.process_count() > 1 \
            else self.n_dev
        self._local_steps = self.batches_per_step * local_dev
        self._has_l = len(self.dataset.get_xdim()) == 3
        self._global_superbatches = None
        if jax.process_count() > 1:
            self.ndatapoints, self._global_superbatches = \
                self._global_stream_geometry()

    def _global_stream_geometry(self):
        """One collective exchange of stream geometry across hosts:
        (psum of unmasked rows, MAX superbatch count, MAX sequence axis).

        Every reduction program call is a collective, so hosts must all
        take the same number of superbatch steps AND emit identically
        shaped superbatches; with unequal local file splits, the short
        hosts pad their streams with masked empty superbatches up to the
        global maximum instead of deadlocking in a rendezvous, and ragged
        corpora (per-host local sequence maxima differ) pad every batch's
        dim1 up to the cross-host maximum.
        """
        # All three quantities are dataset metadata (builder-computed row
        # count; one padded batch per chunk; dim1 max) -- no data pass.
        local_rows = float(self.dataset.get_ndatapoints())
        local_batches = self.dataset.get_n_batches()
        local_steps = -(-local_batches // self._local_steps)
        xdim = self.dataset.get_xdim()
        dim1 = float(xdim[1]) if len(xdim) == 3 else 0.0
        from .distributed import global_host_reduce
        rows, steps, gdim1 = global_host_reduce(
            (local_rows, float(local_steps), dim1),
            ("sum", "max", "max"), self.mesh)
        if len(xdim) == 3:
            self.dataset.set_sequence_pad(int(round(gdim1)))
        return int(round(rows)), int(round(steps))

    # ------------------------------------------------------------------
    def _put(self, arrs):
        """Place a host superbatch tuple across the mesh (async)."""
        if jax.process_count() > 1:
            from .distributed import host_local_stack_to_global
            return tuple(host_local_stack_to_global(a, self.mesh)
                         for a in arrs)
        sh = NamedSharding(self.mesh, P(DATA_AXIS))
        return tuple(jax.device_put(a, sh) for a in arrs)

    def _host_superbatches(self, keep_rng=None, keep_prob=None):
        """Yield (x, l, m, y) host superbatch arrays with S_local padded
        batches each; tail superbatch zero-padded (mask 0).  On
        multi-host runs every host yields exactly the GLOBAL maximum
        superbatch count: hosts whose local split is shorter append fully
        masked empty superbatches, so unequal file splits cannot deadlock
        the collectives (the zero masks contribute nothing)."""
        dt = np.dtype(jnp.dtype(self._dtype).name)
        ydt = np.int32 if self.is_classification else dt
        s_local = self._local_steps
        xdim = self.dataset.get_padded_xdim()
        full_len = xdim[1]
        chunk = self.dataset.get_chunk_size()
        xs, ys, ls, ms = [], [], [], []
        n_yielded = 0

        def assemble():
            n = len(xs)
            pad = s_local - n
            for _ in range(pad):
                xs.append(np.zeros_like(xs[0]))
                ys.append(np.zeros_like(ys[0]))
                ms.append(np.zeros_like(ms[0]))
                ls.append(np.full_like(ls[0], full_len))
            out = (np.stack(xs).astype(dt),
                   np.stack(ls).astype(np.int32),
                   np.stack(ms).astype(dt),
                   np.stack(ys).astype(ydt))
            xs.clear(), ys.clear(), ls.clear(), ms.clear()
            return out

        for xb, yb, lb, mb in self.dataset.padded_batches(with_y=True):
            if keep_prob is not None and keep_prob < 1.0:
                # Exact per-chunk sample count, matching Engine.sketch
                # and the reference's cutoff
                # (rand_nys_constructors.py:82-84).
                from ..utils.rng import exact_count_keep_mask
                keep = exact_count_keep_mask(mb, keep_prob, keep_rng)
                mb = mb * keep.astype(mb.dtype)
            xs.append(np.asarray(xb))
            ys.append(np.zeros(mb.shape, dtype=ydt) if yb is None
                      else np.asarray(yb, dtype=ydt))
            ms.append(np.asarray(mb))
            ls.append(np.full(mb.shape, full_len, dtype=np.int32)
                      if lb is None else np.asarray(lb, dtype=np.int32))
            if len(xs) == s_local:
                n_yielded += 1
                yield assemble()
        if xs:
            n_yielded += 1
            yield assemble()

        target = self._global_superbatches
        while target is not None and n_yielded < target:
            n_yielded += 1
            yield (np.zeros((s_local, chunk) + tuple(xdim[1:]), dtype=dt),
                   np.full((s_local, chunk), full_len, dtype=np.int32),
                   np.zeros((s_local, chunk), dtype=dt),
                   np.zeros((s_local, chunk), dtype=ydt))

    # Maximum host->device superbatch copies in flight.  Backpressure is
    # essential, not optional: device_put is async and every pending
    # copy pins its host-side buffer, so on a slow device link an
    # unthrottled stream enqueues the whole pass's superbatches and the
    # HOST runs out of memory (observed: 130 GB RSS and an OOM kill at
    # 1M rows x 25 CG iterations through a TPU relay).  A depth of ONE,
    # however, serializes the copies and forfeits the link's parallel
    # transfer bandwidth (measured ~6x slower CG through the same
    # relay); a small queue bounds host memory at depth x superbatch
    # bytes while keeping several copies in flight.
    PREFETCH_DEPTH = 8

    def _stream_steps(self, keep_rng=None, keep_prob=None):
        """Device-resident superbatches with bounded-depth prefetch: up
        to PREFETCH_DEPTH host->device copies run concurrently ahead of
        the consumer, overlapping transfer with compute; admission of a
        new copy blocks on the oldest in-flight one (see PREFETCH_DEPTH
        for why both the bound and the depth matter)."""
        from collections import deque
        pending = deque()
        for arrs in self._host_superbatches(keep_rng, keep_prob):
            while len(pending) >= self.PREFETCH_DEPTH:
                jax.block_until_ready(pending[0])
                yield pending.popleft()
            pending.append(self._put(arrs))
        while pending:
            yield pending.popleft()

    # ------------------------------------------------------------------
    # drivers: same programs as ShardedEngine, fed per superbatch.
    def ztzv(self, vec):
        run = self._prog_ztzv()
        v2 = jnp.asarray(vec, self._dtype).reshape(self.num_rffs, -1)
        params = self._params()
        acc = jnp.zeros((self.num_rffs, v2.shape[-1]), dtype=v2.dtype)
        for x, l, m, y in self._stream_steps():
            acc = acc + run(params, x, l, m, y, v2)
        return acc.reshape(vec.shape)

    def zty(self):
        run = self._prog_zty()
        params = self._params()
        acc = jnp.zeros((self.num_rffs,), dtype=self._dtype)
        yty = jnp.zeros((), dtype=self._dtype)
        for x, l, m, y in self._stream_steps():
            a, b = run(params, x, l, m, y)
            acc, yty = acc + a, yty + b
        return acc, float(yty)

    def design_mat(self):
        run = self._prog_design_mat()
        params = self._params()
        m_rffs = self.num_rffs
        ztz = jnp.zeros((m_rffs, m_rffs), dtype=self._dtype)
        zty = jnp.zeros((m_rffs,), dtype=self._dtype)
        yty = jnp.zeros((), dtype=self._dtype)
        for x, l, m, y in self._stream_steps():
            a, b, c = run(params, x, l, m, y)
            ztz, zty, yty = ztz + a, zty + b, yty + c
        return ztz, zty, float(yty)

    def var_design_mat(self, variance_rffs):
        idx_np = self.kernel.variance_column_indices(variance_rffs)
        run = self._prog_var_design_mat(variance_rffs, idx_np)
        params = self._params()
        acc = jnp.zeros((variance_rffs, variance_rffs), dtype=self._dtype)
        for x, l, m, y in self._stream_steps():
            acc = acc + run(params, x, l, m, y)
        return acc

    def sketch(self, srht_radem, sample_idx, with_zty=True,
               row_keep_prob=None, seed=123):
        rank = sample_idx.shape[0]
        run = self._prog_sketch(rank, with_zty)
        params = self._params()
        radem = jnp.asarray(srht_radem, self._dtype)
        idx = jnp.asarray(sample_idx)
        keep_rng = np.random.default_rng(seed)
        if row_keep_prob is not None and row_keep_prob >= 1.0:
            row_keep_prob = None
        m_rffs = self.num_rffs
        acc = jnp.zeros((rank, m_rffs), dtype=self._dtype)
        zty = jnp.zeros((m_rffs,), dtype=self._dtype)
        yty = jnp.zeros((), dtype=self._dtype)
        for x, l, m, y in self._stream_steps(keep_rng, row_keep_prob):
            out = run(params, x, l, m, y, radem, idx)
            if with_zty:
                acc, zty, yty = acc + out[0], zty + out[1], yty + out[2]
            else:
                acc = acc + out
        if with_zty:
            return acc, zty, float(yty)
        return acc

    def softmax_linesearch(self, wvec, direction, steps, lambda_):
        run = self._prog_softmax_ls()
        params = self._params()
        w = jnp.asarray(wvec, self._dtype)
        d = jnp.asarray(direction, self._dtype)
        t = jnp.asarray(steps, self._dtype)
        acc = jnp.zeros((t.shape[0],), dtype=self._dtype)
        for x, l, m, y in self._stream_steps():
            acc = acc + run(params, x, l, m, y, w, d, t)
        return acc

    def classification_loss_grad(self, wvec, lambda_):
        run = self._prog_class_loss_grad()
        params = self._params()
        w = jnp.asarray(wvec, self._dtype)
        loss = jnp.zeros((), dtype=self._dtype)
        grad = jnp.zeros_like(w)
        for x, l, m, y in self._stream_steps():
            a, b = run(params, x, l, m, y, w)
            loss, grad = loss + a, grad + b
        grad = grad.at[1:, :].add((lambda_ ** 2) * w[1:, :])
        total = float(loss) + 0.5 * (lambda_ ** 2) * \
            float(jnp.sum(w[1:, :] ** 2))
        return grad, total

    def gradient_terms(self, subsample=1.0, seed=123):
        grad_fn = self.kernel.pure_gradient_fn()
        if grad_fn is None:
            from ..fitting.engine import Engine
            return Engine(self.kernel, self.dataset,
                          mode="streaming").gradient_terms(subsample, seed)
        nsig = self.kernel.get_hyperparams().shape[0] - 1
        gparams = self.kernel.gradient_params()
        run = self._prog_gradient_terms(grad_fn, nsig)
        keep_rng = np.random.default_rng(seed)
        keep_prob = subsample if subsample < 1.0 else None
        m_rffs = self.num_rffs
        dt = self._dtype
        accs = (jnp.zeros((m_rffs, m_rffs), dt),
                jnp.zeros((m_rffs,), dt),
                jnp.zeros((), dt),
                jnp.zeros((m_rffs, nsig), dt),
                jnp.zeros((m_rffs, m_rffs, nsig), dt),
                jnp.zeros((), dt))
        for x, l, m, y in self._stream_steps(keep_rng, keep_prob):
            out = run(gparams, x, l, m, y)
            accs = tuple(a + o for a, o in zip(accs, out))
        ztz, zty, yty, dz_ty, inner, n = accs
        inner = inner + jnp.transpose(inner, (1, 0, 2))
        return ztz, zty, float(yty), dz_ty, inner, int(n)
