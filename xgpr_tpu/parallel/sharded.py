"""Sharded dataset reductions: the multi-chip engine.

Design (SURVEY.md section 2.9 / BASELINE north star): the stacked batch
tensor is sharded over a 1-D device mesh on the batch axis; each device
scans its local shard accumulating Z^T (Z v) / Z^T Z / Z^T y partials, and
the (M, ...) results are combined with ``psum`` over ICI.  CG's vector
iterates and the preconditioner stay replicated -- they are O(M) and tiny
next to the data.

This mirrors the reference's out-of-core chunk reduction
(cg_tools.py:26-53) but turns the Python ``+=`` loop into an SPMD
collective, which is exactly the transformation the chunk-sum's
associativity licenses.

Each reduction is split into a *program* (a jitted shard_map over a
(batches, chunk, ...) stack, built once per engine) and a *driver* that
feeds it.  ``ShardedEngine`` feeds the whole device-resident stack in one
call; ``StreamingShardedEngine`` (parallel/streaming.py) feeds the same
programs superbatch-by-superbatch for datasets larger than aggregate
device memory.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from .mesh import DATA_AXIS, data_mesh
from .. import config
from ..ops.contract import mm as _mm, ztzv_contract as _ztzv_contract


class ShardedEngine:
    """Drop-in Engine replacement whose reductions run SPMD over a mesh.

    Exposes the subset of the Engine API the solvers use (ztzv, zty,
    design_mat, sketch, gauss_pass, var_design_mat), so NystromPreconditioner,
    ConjugateGrad and cg_fit work unchanged on top of it.
    """

    def __init__(self, kernel, dataset, mesh=None):
        self.kernel = kernel
        self.dataset = dataset
        self.fn = kernel.pure_feature_fn()
        self.num_rffs = kernel.get_num_rffs()
        self.ndatapoints = dataset.get_ndatapoints()
        self.is_classification = dataset.get_n_classes() is not None
        self.mesh = mesh if mesh is not None else data_mesh()
        self.n_dev = self.mesh.devices.size
        self._dtype = config.fp_dtype()
        self._jit_cache = {}
        self._build_stack()

    # ------------------------------------------------------------------
    def _build_stack(self):
        """Stack padded batches and shard them over the mesh.

        The batch count is padded to a multiple of the mesh size with
        all-masked batches (mask rows 0), which contribute exactly zero to
        every reduction.
        """
        xs, ys, ls, ms = [], [], [], []
        has_l = False
        ydt = np.int32 if self.is_classification else np.float64
        if jax.process_count() > 1 and len(self.dataset.get_xdim()) == 3:
            # Ragged corpora split across hosts: agree on the global
            # sequence-axis maximum so every host's batches share one
            # shape (per-host local maxima otherwise diverge and the
            # global array assembly fails).
            from .distributed import global_host_reduce
            (gdim1,) = global_host_reduce(
                (float(self.dataset.get_xdim()[1]),), ("max",), self.mesh)
            self.dataset.set_sequence_pad(int(round(gdim1)))
        for xb, yb, lb, mb in self.dataset.padded_batches(with_y=True):
            xs.append(np.asarray(xb))
            ys.append(np.asarray(yb, dtype=ydt))
            ms.append(mb)
            if lb is not None:
                has_l = True
                ls.append(lb)
        nb = len(xs)
        # In a multi-host job each process holds its local shard of the
        # dataset; pad the LOCAL batch count to the local device count so
        # every host contributes equally-shaped shards.
        pad_base = jax.local_device_count() if jax.process_count() > 1 \
            else self.n_dev
        pad = (-nb) % pad_base
        for _ in range(pad):
            xs.append(np.zeros_like(xs[0]))
            ys.append(np.zeros_like(ys[0]))
            ms.append(np.zeros_like(ms[0]))
            if has_l:
                ls.append(np.full_like(ls[0], self.dataset.padded_seq_len()))

        from .distributed import host_local_stack_to_global
        dt = np.dtype(jnp.dtype(self._dtype).name)
        self._x = host_local_stack_to_global(
            np.stack(xs).astype(dt), self.mesh)
        self._y = host_local_stack_to_global(
            np.stack(ys).astype(np.int32 if self.is_classification
                                else dt), self.mesh)
        # Host copy of the LOCAL mask shard: subsampling reads mask
        # values, and np.asarray on the global array would raise on
        # multi-host runs (non-addressable shards).
        self._m_host = np.stack(ms).astype(dt)
        self._m = host_local_stack_to_global(self._m_host, self.mesh)
        if not has_l:
            # Fixed-vector kernels ignore seq_len; a dummy keeps every
            # shard_map signature uniform.
            ls = [np.zeros(ms[0].shape, dtype=np.int32) for _ in ms]
        self._l = host_local_stack_to_global(
            np.stack(ls).astype(np.int32), self.mesh)
        if jax.process_count() > 1:
            # Global datapoint count = total unmasked rows across hosts.
            self.ndatapoints = int(jnp.sum(self._m))

    def _params(self):
        return self.kernel.feature_params()

    def _get_jit(self, name, builder):
        fn = self._jit_cache.get(name)
        if fn is None:
            fn = builder()
            self._jit_cache[name] = fn
        return fn

    def _feat(self, params, xb, lb, mb):
        z = self.fn(params, xb, lb)
        return z * mb[:, None]

    def _shard_reduce(self, local, n_rep_in, n_out):
        """shard_map wrapper: data stack sharded on the batch axis,
        trailing n_rep_in operands replicated, n_out replicated outputs."""
        data_specs = (P(DATA_AXIS),) * 4
        out_specs = P() if n_out == 1 else (P(),) * n_out
        fn = shard_map(local, mesh=self.mesh, check_vma=False,
                       in_specs=(P(),) + data_specs + (P(),) * n_rep_in,
                       out_specs=out_specs)
        return jax.jit(fn)

    # ------------------------------------------------------------------
    # reduction programs: jitted shard_map over a (B, chunk, ...) stack.
    # Drivers below feed the whole stack (stacked mode) or superbatches
    # (streaming subclass).
    def _prog_ztzv(self):
        feat = self._feat

        def build():
            def local(params, x, l, m, y, v):
                def body(acc, batch):
                    xb, lb, mb = batch
                    z = feat(params, xb, lb, mb)
                    return acc + _ztzv_contract(z, v), None
                init = jnp.zeros((self.num_rffs, v.shape[-1]),
                                 dtype=v.dtype)
                acc, _ = jax.lax.scan(body, init, (x, l, m))
                return jax.lax.psum(acc, DATA_AXIS)
            return self._shard_reduce(local, 1, 1)
        return self._get_jit("ztzv", build)

    def _prog_zty(self):
        feat = self._feat

        def build():
            def local(params, x, l, m, y):
                def body(carry, batch):
                    xb, lb, mb, yb = batch
                    z = feat(params, xb, lb, mb)
                    ym = yb * mb
                    acc, yty = carry
                    return (acc + _mm(z.T, ym[:, None])[:, 0],
                            yty + ym @ ym), None
                init = (jnp.zeros((self.num_rffs,), dtype=x.dtype),
                        jnp.zeros((), dtype=x.dtype))
                (acc, yty), _ = jax.lax.scan(body, init, (x, l, m, y))
                return (jax.lax.psum(acc, DATA_AXIS),
                        jax.lax.psum(yty, DATA_AXIS))
            return self._shard_reduce(local, 0, 2)
        return self._get_jit("zty", build)

    def _prog_design_mat(self):
        feat = self._feat

        def build():
            def local(params, x, l, m, y):
                def body(carry, batch):
                    xb, lb, mb, yb = batch
                    z = feat(params, xb, lb, mb)
                    ym = yb * mb
                    ztz, zty, yty = carry
                    return (ztz + _mm(z.T, z),
                            zty + _mm(z.T, ym[:, None])[:, 0],
                            yty + ym @ ym), None
                m_rffs = self.num_rffs
                init = (jnp.zeros((m_rffs, m_rffs), dtype=x.dtype),
                        jnp.zeros((m_rffs,), dtype=x.dtype),
                        jnp.zeros((), dtype=x.dtype))
                (ztz, zty, yty), _ = jax.lax.scan(body, init,
                                                  (x, l, m, y))
                return (jax.lax.psum(ztz, DATA_AXIS),
                        jax.lax.psum(zty, DATA_AXIS),
                        jax.lax.psum(yty, DATA_AXIS))
            return self._shard_reduce(local, 0, 3)
        return self._get_jit("design_mat", build)

    def _prog_var_design_mat(self, variance_rffs, idx_np):
        feat = self._feat

        def build():
            idx = jnp.asarray(idx_np)

            def local(params, x, l, m, y):
                def body(acc, batch):
                    xb, lb, mb = batch
                    z = jnp.take(feat(params, xb, lb, mb), idx, axis=1)
                    return acc + _mm(z.T, z), None
                init = jnp.zeros((variance_rffs, variance_rffs),
                                 dtype=x.dtype)
                acc, _ = jax.lax.scan(body, init, (x, l, m))
                return jax.lax.psum(acc, DATA_AXIS)
            return self._shard_reduce(local, 0, 1)
        return self._get_jit(f"var_design_mat_{variance_rffs}", build)

    def _prog_sketch(self, rank, with_zty):
        from ..ops.sorf import srht_rows
        feat = self._feat

        def build():
            def local(params, x, l, m, y, radem, idx):
                def body(carry, batch):
                    xb, lb, mb, yb = batch
                    z = feat(params, xb, lb, mb)
                    sz = srht_rows(z, radem, idx)
                    if with_zty:
                        acc, zty, yty = carry
                        ym = yb * mb
                        return (acc + _mm(sz.T, z),
                                zty + _mm(z.T, ym[:, None])[:, 0],
                                yty + ym @ ym), None
                    return carry + _mm(sz.T, z), None
                m_rffs = self.num_rffs
                if with_zty:
                    init = (jnp.zeros((rank, m_rffs), dtype=x.dtype),
                            jnp.zeros((m_rffs,), dtype=x.dtype),
                            jnp.zeros((), dtype=x.dtype))
                else:
                    init = jnp.zeros((rank, m_rffs), dtype=x.dtype)
                out, _ = jax.lax.scan(body, init, (x, l, m, y))
                return jax.tree.map(
                    lambda t: jax.lax.psum(t, DATA_AXIS), out)
            return self._shard_reduce(local, 2, 3 if with_zty else 1)
        return self._get_jit(f"sketch_{rank}_{with_zty}", build)

    def _prog_softmax_ls(self):
        feat = self._feat

        def build():
            def local(params, x, l, m, y, w, d, steps):
                def body(acc, batch):
                    xb, lb, mb, yb = batch
                    z = feat(params, xb, lb, mb)
                    zw = _mm(z, w)
                    zd = _mm(z, d)
                    logits = zw[None, :, :] + \
                        steps[:, None, None] * zd[None, :, :]
                    lse = jax.nn.logsumexp(logits, axis=2)
                    lab = jnp.broadcast_to(
                        yb[None, :, None],
                        (steps.shape[0], yb.shape[0], 1))
                    hit = jnp.take_along_axis(logits, lab, axis=2)[..., 0]
                    return acc + jnp.sum((lse - hit) * mb[None, :],
                                         axis=1), None
                init = jnp.zeros((steps.shape[0],), w.dtype)
                acc, _ = jax.lax.scan(body, init, (x, l, m, y))
                return jax.lax.psum(acc, DATA_AXIS)
            return self._shard_reduce(local, 3, 1)
        return self._get_jit("softmax_ls", build)

    def _prog_class_loss_grad(self):
        feat = self._feat

        def build():
            def local(params, x, l, m, y, w):
                def body(carry, batch):
                    xb, lb, mb, yb = batch
                    z = feat(params, xb, lb, mb)
                    pred = _mm(z, w)
                    pred = pred - jnp.max(pred, axis=1, keepdims=True)
                    p = jnp.exp(pred)
                    p = p / jnp.sum(p, axis=1, keepdims=True)
                    logp = jnp.log(jnp.clip(p, min=1e-16))
                    picked = jnp.take_along_axis(logp, yb[:, None],
                                                 axis=1)[:, 0]
                    onehot = jax.nn.one_hot(yb, w.shape[1], dtype=z.dtype)
                    loss, grad = carry
                    return (loss - jnp.sum(picked * mb),
                            grad + _mm(z.T, (p - onehot) * mb[:, None])), \
                        None
                init = (jnp.zeros((), dtype=x.dtype), jnp.zeros_like(w))
                (loss, grad), _ = jax.lax.scan(body, init, (x, l, m, y))
                return (jax.lax.psum(loss, DATA_AXIS),
                        jax.lax.psum(grad, DATA_AXIS))
            return self._shard_reduce(local, 1, 2)
        return self._get_jit("class_loss_grad", build)

    def _prog_gradient_terms(self, grad_fn, nsig):
        def build():
            def local(gparams, x, l, m, y):
                def body(carry, batch):
                    xb, lb, mb, yb = batch
                    z, dz = grad_fn(gparams, xb, lb)
                    z = z * mb[:, None]
                    dz = dz * mb[:, None, None]
                    ym = yb * mb
                    prec = config.matmul_precision()
                    t = (_mm(z.T, z),
                         _mm(z.T, ym[:, None])[:, 0],
                         ym @ ym,
                         jnp.einsum("nmi,n->mi", dz, ym, precision=prec),
                         jnp.einsum("nmi,nk->mki", dz, z, precision=prec),
                         jnp.sum(mb))
                    return tuple(c + u for c, u in zip(carry, t)), None
                m_rffs = self.num_rffs
                init = (jnp.zeros((m_rffs, m_rffs), x.dtype),
                        jnp.zeros((m_rffs,), x.dtype),
                        jnp.zeros((), x.dtype),
                        jnp.zeros((m_rffs, nsig), x.dtype),
                        jnp.zeros((m_rffs, m_rffs, nsig), x.dtype),
                        jnp.zeros((), x.dtype))
                out, _ = jax.lax.scan(body, init, (x, l, m, y))
                return jax.tree.map(
                    lambda t: jax.lax.psum(t, DATA_AXIS), out)
            return self._shard_reduce(local, 0, 6)
        return self._get_jit("gradient_terms", build)

    # ------------------------------------------------------------------
    # drivers (whole device-resident stack in one program call)
    def ztzv(self, vec):
        run = self._prog_ztzv()
        v2 = jnp.asarray(vec, self._dtype).reshape(self.num_rffs, -1)
        out = run(self._params(), self._x, self._l, self._m, self._y, v2)
        return out.reshape(vec.shape)

    def gauss_pass(self, q_mat):
        return self.ztzv(q_mat)

    def zty(self):
        run = self._prog_zty()
        acc, yty = run(self._params(), self._x, self._l, self._m, self._y)
        return acc, float(yty)

    def design_mat(self):
        run = self._prog_design_mat()
        ztz, zty, yty = run(self._params(), self._x, self._l, self._m,
                            self._y)
        return ztz, zty, float(yty)

    def var_design_mat(self, variance_rffs):
        idx_np = self.kernel.variance_column_indices(variance_rffs)
        run = self._prog_var_design_mat(variance_rffs, idx_np)
        return run(self._params(), self._x, self._l, self._m, self._y)

    def _subsampled_mask_stack(self, row_keep_prob, seed):
        """Row-subsampled copy of the global mask stack.  An exact count
        of real rows is kept per stacked chunk, matching the reference's
        per-chunk cutoff (rand_nys_constructors.py:82-84), so the
        realised sample fraction equals the nominal one; shapes stay
        static."""
        if row_keep_prob is None or row_keep_prob >= 1.0:
            return self._m
        from ..utils import rng as state_rng
        from .distributed import host_local_stack_to_global
        # Work on the LOCAL host shard (the global array's values are
        # not addressable from one process on multi-host runs) and
        # assemble the keep mask globally the same way the mask stack
        # itself was.  Each host draws from its own identically-seeded
        # stream over its own batches; the subsample is an estimator, so
        # host-count invariance is not required (the reference's
        # per-chunk sampling has the same property).
        rng = np.random.default_rng(seed)
        m_host = self._m_host
        keep = np.stack([
            state_rng.exact_count_keep_mask(row, row_keep_prob, rng)
            for row in m_host.reshape(m_host.shape[0], -1)
        ]).reshape(m_host.shape).astype(m_host.dtype)
        return self._m * host_local_stack_to_global(keep, self.mesh)

    def sketch(self, srht_radem, sample_idx, with_zty=True,
               row_keep_prob=None, seed=123):
        rank = sample_idx.shape[0]
        mask_stack = self._subsampled_mask_stack(row_keep_prob, seed)
        run = self._prog_sketch(rank, with_zty)
        radem = jnp.asarray(srht_radem, self._dtype)
        idx = jnp.asarray(sample_idx)
        out = run(self._params(), self._x, self._l, mask_stack, self._y,
                  radem, idx)
        if with_zty:
            acc, zty, yty = out
            return acc, zty, float(yty)
        return out

    def softmax_linesearch(self, wvec, direction, steps, lambda_):
        """SPMD one-pass line search: per-shard CE loss of (W + t D) at
        every candidate step, psum'd over the mesh.  Mirrors
        Engine.softmax_linesearch."""
        run = self._prog_softmax_ls()
        return run(self._params(), self._x, self._l, self._m, self._y,
                   jnp.asarray(wvec, self._dtype),
                   jnp.asarray(direction, self._dtype),
                   jnp.asarray(steps, self._dtype))

    def gradient_terms(self, subsample=1.0, seed=123):
        """SPMD exact-NMLL gradient accumulation: each device scans its
        local shard computing (Z^T Z, Z^T y, y^T y, dZ^T y, dZ^T Z, n)
        partials via the kernel's pure gradient fn, psum'd over the mesh.
        L-BFGS-B exact tuning therefore runs fully sharded (the reference
        has no distributed gradient path; SURVEY.md section 2.9)."""
        grad_fn = self.kernel.pure_gradient_fn()
        if grad_fn is None:
            from ..fitting.engine import Engine
            return Engine(self.kernel, self.dataset,
                          mode="streaming").gradient_terms(subsample, seed)
        nsig = self.kernel.get_hyperparams().shape[0] - 1
        gparams = self.kernel.gradient_params()
        mask_stack = self._subsampled_mask_stack(
            subsample if subsample < 1.0 else None, seed)
        run = self._prog_gradient_terms(grad_fn, nsig)
        ztz, zty, yty, dz_ty, inner, n = run(
            gparams, self._x, self._l, mask_stack, self._y)
        inner = inner + jnp.transpose(inner, (1, 0, 2))
        return ztz, zty, float(yty), dz_ty, inner, int(n)

    def classification_loss_grad(self, wvec, lambda_):
        """SPMD softmax CE loss + grad (classification over the mesh)."""
        run = self._prog_class_loss_grad()
        w = jnp.asarray(wvec, self._dtype)
        loss, grad = run(self._params(), self._x, self._l, self._m,
                         self._y, w)
        grad = grad.at[1:, :].add((lambda_ ** 2) * w[1:, :])
        loss = float(loss) + 0.5 * (lambda_ ** 2) * \
            float(jnp.sum(w[1:, :] ** 2))
        return grad, loss
