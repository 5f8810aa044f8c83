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
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from .mesh import DATA_AXIS, data_mesh
from .. import config

def _mm(a, b):
    from .. import config as _cfg
    return jnp.matmul(a, b, precision=_cfg.matmul_precision())

def _ztzv_contract(z, v):
    """Z^T (Z v) with optional bf16 feature materialisation
    (config.set_feature_dtype): halves the dominant HBM traffic of the
    matvec; accumulation stays float32."""
    from .. import config as _cfg
    fd = _cfg.feature_dtype()
    if fd is not None:
        zb = z.astype(fd)
        zv = jnp.matmul(zb, v.astype(fd),
                        preferred_element_type=jnp.float32)
        return jnp.matmul(zb.T, zv.astype(fd),
                          preferred_element_type=jnp.float32)
    return _mm(z.T, _mm(z, v))



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
                ls.append(np.full_like(ls[0], self.dataset.get_xdim()[1]))

        from .distributed import host_local_stack_to_global
        dt = np.dtype(jnp.dtype(self._dtype).name)
        self._x = host_local_stack_to_global(
            np.stack(xs).astype(dt), self.mesh)
        self._y = host_local_stack_to_global(
            np.stack(ys).astype(np.int32 if self.is_classification
                                else dt), self.mesh)
        self._m = host_local_stack_to_global(
            np.stack(ms).astype(dt), self.mesh)
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

    # ------------------------------------------------------------------
    def ztzv(self, vec):
        feat = self._feat

        def build():
            def local(params, x, l, m, v):
                def body(acc, batch):
                    xb, lb, mb = batch
                    z = feat(params, xb, lb, mb)
                    return acc + _ztzv_contract(z, v), None
                init = jnp.zeros((self.num_rffs, v.shape[-1]),
                                 dtype=v.dtype)
                xs = (x, l, m)
                acc, _ = jax.lax.scan(body, init, xs)
                return jax.lax.psum(acc, DATA_AXIS)

            data_specs = (P(DATA_AXIS),) * 3
            fn = shard_map(local, mesh=self.mesh, check_vma=False,
                           in_specs=(P(),) + data_specs + (P(),),
                           out_specs=P())
            return jax.jit(fn)
        run = self._get_jit("ztzv", build)
        v2 = jnp.asarray(vec, self._dtype).reshape(self.num_rffs, -1)
        args = (self._params(), self._x, self._l, self._m, v2)
        out = run(*args)
        return out.reshape(vec.shape)

    def gauss_pass(self, q_mat):
        return self.ztzv(q_mat)

    def zty(self):
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
                xs = (x, l, m, y)
                (acc, yty), _ = jax.lax.scan(body, init, xs)
                return (jax.lax.psum(acc, DATA_AXIS),
                        jax.lax.psum(yty, DATA_AXIS))

            data_specs = (P(DATA_AXIS),) * 4
            fn = shard_map(local, mesh=self.mesh, check_vma=False,
                           in_specs=(P(),) + data_specs,
                           out_specs=(P(), P()))
            return jax.jit(fn)
        run = self._get_jit("zty", build)
        args = (self._params(), self._x, self._l, self._m, self._y)
        acc, yty = run(*args)
        return acc, float(yty)

    def design_mat(self):
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
                xs = (x, l, m, y)
                (ztz, zty, yty), _ = jax.lax.scan(body, init, xs)
                return (jax.lax.psum(ztz, DATA_AXIS),
                        jax.lax.psum(zty, DATA_AXIS),
                        jax.lax.psum(yty, DATA_AXIS))

            data_specs = (P(DATA_AXIS),) * 4
            fn = shard_map(local, mesh=self.mesh, check_vma=False,
                           in_specs=(P(),) + data_specs,
                           out_specs=(P(), P(), P()))
            return jax.jit(fn)
        run = self._get_jit("design_mat", build)
        args = (self._params(), self._x, self._l, self._m, self._y)
        ztz, zty, yty = run(*args)
        return ztz, zty, float(yty)

    def var_design_mat(self, variance_rffs):
        feat = self._feat
        idx_np = self.kernel.variance_column_indices(variance_rffs)

        def build():
            idx = jnp.asarray(idx_np)

            def local(params, x, l, m):
                def body(acc, batch):
                    xb, lb, mb = batch
                    z = jnp.take(feat(params, xb, lb, mb), idx, axis=1)
                    return acc + _mm(z.T, z), None
                init = jnp.zeros((variance_rffs, variance_rffs),
                                 dtype=x.dtype)
                xs = (x, l, m)
                acc, _ = jax.lax.scan(body, init, xs)
                return jax.lax.psum(acc, DATA_AXIS)

            data_specs = (P(DATA_AXIS),) * 3
            fn = shard_map(local, mesh=self.mesh, check_vma=False,
                           in_specs=(P(),) + data_specs,
                           out_specs=P())
            return jax.jit(fn)
        run = self._get_jit(f"var_design_mat_{variance_rffs}", build)
        args = (self._params(), self._x, self._l, self._m)
        return run(*args)

    def sketch(self, srht_radem, sample_idx, with_zty=True,
               row_keep_prob=None, seed=123):
        from ..ops.sorf import srht_rows
        feat = self._feat
        rank = sample_idx.shape[0]

        mask_stack = self._m
        if row_keep_prob is not None and row_keep_prob < 1.0:
            rng = np.random.default_rng(seed)
            keep = (rng.random(tuple(self._m.shape)) <
                    row_keep_prob).astype(np.float64)
            mask_stack = self._m * jax.device_put(
                jnp.asarray(keep, self._m.dtype),
                NamedSharding(self.mesh, P(DATA_AXIS)))

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
                xs = (x, l, m, y)
                out, _ = jax.lax.scan(body, init, xs)
                return jax.tree.map(
                    lambda t: jax.lax.psum(t, DATA_AXIS), out)

            data_specs = (P(DATA_AXIS),) * 4
            out_specs = (P(), P(), P()) if with_zty else P()
            fn = shard_map(local, mesh=self.mesh, check_vma=False,
                           in_specs=(P(),) + data_specs + (P(), P()),
                           out_specs=out_specs)
            return jax.jit(fn)
        name = f"sketch_{rank}_{with_zty}"
        run = self._get_jit(name, build)
        radem = jnp.asarray(srht_radem, self._dtype)
        idx = jnp.asarray(sample_idx)
        args = (self._params(), self._x, self._l, mask_stack, self._y, radem, idx)
        out = run(*args)
        if with_zty:
            acc, zty, yty = out
            return acc, zty, float(yty)
        return out

    def softmax_linesearch(self, wvec, direction, steps, lambda_):
        """SPMD one-pass line search: per-shard CE loss of (W + t D) at
        every candidate step, psum'd over the mesh.  Mirrors
        Engine.softmax_linesearch."""
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

            data_specs = (P(DATA_AXIS),) * 4
            fn = shard_map(local, mesh=self.mesh, check_vma=False,
                           in_specs=(P(),) + data_specs + (P(),) * 3,
                           out_specs=P())
            return jax.jit(fn)
        run = self._get_jit("softmax_ls", build)
        return run(self._params(), self._x, self._l, self._m, self._y,
                   jnp.asarray(wvec, self._dtype),
                   jnp.asarray(direction, self._dtype),
                   jnp.asarray(steps, self._dtype))

    def gradient_terms(self, subsample=1.0, seed=123):
        """NMLL-gradient accumulation is small-M work used only by the
        exact tuner; delegate to the single-device streaming engine."""
        from ..fitting.engine import Engine
        return Engine(self.kernel, self.dataset,
                      mode="streaming").gradient_terms(subsample, seed)

    def classification_loss_grad(self, wvec, lambda_):
        """SPMD softmax CE loss + grad (classification over the mesh)."""
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
                xs = (x, l, m, y)
                (loss, grad), _ = jax.lax.scan(body, init, xs)
                return (jax.lax.psum(loss, DATA_AXIS),
                        jax.lax.psum(grad, DATA_AXIS))

            data_specs = (P(DATA_AXIS),) * 4
            fn = shard_map(local, mesh=self.mesh, check_vma=False,
                           in_specs=(P(),) + data_specs + (P(),),
                           out_specs=(P(), P()))
            return jax.jit(fn)
        run = self._get_jit("class_loss_grad", build)
        w = jnp.asarray(wvec, self._dtype)
        args = (self._params(), self._x, self._l, self._m, self._y, w)
        loss, grad = run(*args)
        grad = grad.at[1:, :].add((lambda_ ** 2) * w[1:, :])
        loss = float(loss) + 0.5 * (lambda_ ** 2) * \
            float(jnp.sum(w[1:, :] ** 2))
        return grad, loss
