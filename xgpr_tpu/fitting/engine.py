"""Streamed / stacked dataset reductions.

Every heavy operation in the system is a reduction over dataset chunks:
Z^T Z v (CG matvec), Z^T Z / Z^T y (exact fitting and NMLL), SRHT sketches
(Nystrom preconditioner) -- see SURVEY.md section 2.9.  The reference
implements these as Python loops of numpy/cupy matmuls (cg_tools.py:26-53,
exact_nmll_calcs.py:42-78, rand_nys_constructors.py:96-123).

Here each reduction is a jitted ``lax.scan`` over fixed-shape padded batches
("stacked" mode -- dataset resident on device, the TPU fast path) or a
Python loop feeding one jitted batch kernel ("streaming" mode -- out-of-core
datasets).  Padded rows are zeroed via a row mask after featurisation, so
chunk padding never perturbs a reduction.  All matmuls pin HIGHEST precision
(TPU default would silently round to bf16).
"""
import numpy as np
import jax
import jax.numpy as jnp

from .. import config
from ..utils import rng as state_rng

# Stacked mode is used when the raw data fits comfortably on device;
# the threshold lives in config (set_stacked_limit) so hosts with more
# HBM headroom can raise it.  This alias keeps the historical import
# path working but always defers to config at decision time.
def _stacked_element_limit():
    return config.stacked_element_limit()


from ..ops.contract import mm as _mm, ztzv_contract as _ztzv_contract



class Engine:
    """Bundles (kernel, dataset) and exposes jit-compiled reductions."""

    def __init__(self, kernel, dataset, mode=None):
        self.kernel = kernel
        self.dataset = dataset
        self.fn = kernel.pure_feature_fn()
        self.num_rffs = kernel.get_num_rffs()
        self.ndatapoints = dataset.get_ndatapoints()
        self.is_classification = dataset.get_n_classes() is not None
        self._dtype = config.fp_dtype()
        self._jit_cache = {}

        if mode is None:
            n_elements = int(np.prod(dataset.get_xdim()))
            from ..data.dataset import OnlineDataset
            mode = "stacked" if (isinstance(dataset, OnlineDataset)
                                 and n_elements < _stacked_element_limit()) \
                else "streaming"
        self.mode = mode
        self._stacked = None
        if mode == "stacked":
            self._build_stack()

    # ------------------------------------------------------------------
    def _build_stack(self):
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
        dt = self._dtype
        # Host copy of the masks: subsampling (sketch row_keep_prob)
        # reads mask VALUES on host, and reading them back from the
        # device array would force a sync per chunk.
        self._m_host = np.stack(ms)
        self._stacked = {
            "x": jnp.asarray(np.stack(xs), dtype=dt),
            "y": jnp.asarray(np.stack(ys),
                             dtype=jnp.int32 if self.is_classification
                             else dt),
            "l": jnp.asarray(np.stack(ls), dtype=jnp.int32) if has_l
                 else None,
            "m": jnp.asarray(np.stack(ms), dtype=dt),
        }

    def _params(self):
        return self.kernel.feature_params()

    def _batches(self, with_y=True, host_mask=False):
        """Yield (x, y, l, mask[, host_mask]) jnp batches in the working
        dtype.  ``host_mask=True`` appends the mask as a host numpy array
        (free: stacked mode keeps a host copy, streaming masks are built
        on host) so callers that inspect mask VALUES never sync the
        device."""
        dt = self._dtype
        if self.mode == "stacked":
            s = self._stacked
            nb = s["x"].shape[0]
            for i in range(nb):
                lb = None if s["l"] is None else s["l"][i]
                row = (s["x"][i], s["y"][i], lb, s["m"][i])
                yield row + (self._m_host[i],) if host_mask else row
        else:
            ydt = jnp.int32 if self.is_classification else dt
            for xb, yb, lb, mb in self.dataset.padded_batches(with_y=with_y):
                row = (jnp.asarray(xb, dtype=dt),
                       None if yb is None else jnp.asarray(yb, dtype=ydt),
                       None if lb is None else jnp.asarray(lb, jnp.int32),
                       jnp.asarray(mb, dtype=dt))
                yield row + (np.asarray(mb),) if host_mask else row

    # ------------------------------------------------------------------
    # jitted batch kernels (cached per reduction name)
    def _get_jit(self, name, builder):
        fn = self._jit_cache.get(name)
        if fn is None:
            fn = builder()
            self._jit_cache[name] = fn
        return fn

    def _features(self, params, xb, lb, mb):
        z = self.fn(params, xb, lb)
        return z * mb[:, None]

    # ------------------------------------------------------------------
    # public reductions
    def ztzv(self, vec):
        """Sum_batches Z^T (Z v); vec is (M,) or (M, K)."""
        feat = self._features

        if self.mode == "stacked":
            parts_fn = self.kernel.pure_feature_parts_fn()
            positions = self.kernel.feature_positions() if parts_fn \
                else None

            def build():
                if positions is not None:
                    cos_pos = jnp.asarray(positions[0])
                    sin_pos = jnp.asarray(positions[1])

                    @jax.jit
                    def run(params, x, l, m, v):
                        v_c = jnp.take(v, cos_pos, axis=0)
                        v_s = jnp.take(v, sin_pos, axis=0)

                        def body(acc, batch):
                            if l is None:
                                xb, mb = batch
                                lb = None
                            else:
                                xb, lb, mb = batch
                            c, s = parts_fn(params, xb, lb)
                            c = c * mb[:, None]
                            s = s * mb[:, None]
                            zv = _mm(c, v_c) + _mm(s, v_s)
                            return (acc[0] + _mm(c.T, zv),
                                    acc[1] + _mm(s.T, zv)), None
                        f = cos_pos.shape[0]
                        init = (jnp.zeros((f, v.shape[-1]), v.dtype),
                                jnp.zeros((f, v.shape[-1]), v.dtype))
                        xs = (x, m) if l is None else (x, l, m)
                        (oc, os), _ = jax.lax.scan(body, init, xs)
                        out = jnp.zeros_like(v)
                        return out.at[cos_pos].set(oc).at[sin_pos].set(os)
                    return run

                @jax.jit
                def run(params, x, l, m, v):
                    def body(acc, batch):
                        if l is None:
                            xb, mb = batch
                            lb = None
                        else:
                            xb, lb, mb = batch
                        z = feat(params, xb, lb, mb)
                        return acc + _ztzv_contract(z, v), None
                    init = jnp.zeros((self.num_rffs, v.shape[-1]),
                                     dtype=v.dtype)
                    xs = (x, m) if l is None else (x, l, m)
                    acc, _ = jax.lax.scan(body, init, xs)
                    return acc
                return run
            run = self._get_jit("ztzv_stacked", build)
            s = self._stacked
            v2 = jnp.asarray(vec, self._dtype).reshape(self.num_rffs, -1)
            out = run(self._params(), s["x"], s["l"], s["m"], v2)
            return out.reshape(vec.shape)

        def build():
            @jax.jit
            def run(params, xb, lb, mb, v):
                z = feat(params, xb, lb, mb)
                return _ztzv_contract(z, v)
            return run
        run = self._get_jit("ztzv_stream", build)
        v2 = jnp.asarray(vec, self._dtype).reshape(self.num_rffs, -1)
        acc = jnp.zeros_like(v2)
        params = self._params()
        for xb, _, lb, mb in self._batches(with_y=False):
            acc = acc + run(params, xb, lb, mb, v2)
        return acc.reshape(vec.shape)

    def design_mat(self):
        """(Z^T Z, Z^T y, y^T y) in one pass (exact_nmll_calcs.py:42-78)."""
        feat = self._features
        m = self.num_rffs

        if self.mode == "stacked":
            def build():
                @jax.jit
                def run(params, x, l, m_mask, y):
                    def body(carry, batch):
                        if l is None:
                            xb, mb, yb = batch
                            lb = None
                        else:
                            xb, lb, mb, yb = batch
                        z = feat(params, xb, lb, mb)
                        ym = yb * mb
                        ztz, zty, yty = carry
                        return (ztz + _mm(z.T, z),
                                zty + _mm(z.T, ym[:, None])[:, 0],
                                yty + ym @ ym), None
                    init = (jnp.zeros((m, m), x.dtype),
                            jnp.zeros((m,), x.dtype),
                            jnp.zeros((), x.dtype))
                    xs = (x, m_mask, y) if l is None else (x, l, m_mask, y)
                    out, _ = jax.lax.scan(body, init, xs)
                    return out
                return run
            run = self._get_jit("design_mat_stacked", build)
            s = self._stacked
            ztz, zty, yty = run(self._params(), s["x"], s["l"], s["m"],
                                s["y"])
            return ztz, zty, float(yty)

        def build():
            @jax.jit
            def run(params, xb, lb, mb, yb):
                z = feat(params, xb, lb, mb)
                ym = yb * mb
                return _mm(z.T, z), _mm(z.T, ym[:, None])[:, 0], ym @ ym
            return run
        run = self._get_jit("design_mat", build)
        ztz = jnp.zeros((m, m), dtype=self._dtype)
        zty = jnp.zeros((m,), dtype=self._dtype)
        yty = jnp.zeros((), dtype=self._dtype)
        params = self._params()
        for xb, yb, lb, mb in self._batches():
            a, b, c = run(params, xb, lb, mb, yb)
            ztz, zty, yty = ztz + a, zty + b, yty + c
        return ztz, zty, float(yty)

    def zty(self):
        """(Z^T y, y^T y) (exact_nmll_calcs.py:13-39)."""
        feat = self._features

        if self.mode == "stacked":
            def build():
                @jax.jit
                def run(params, x, l, m_mask, y):
                    def body(carry, batch):
                        if l is None:
                            xb, mb, yb = batch
                            lb = None
                        else:
                            xb, lb, mb, yb = batch
                        z = feat(params, xb, lb, mb)
                        ym = yb * mb
                        zty, yty = carry
                        return (zty + _mm(z.T, ym[:, None])[:, 0],
                                yty + ym @ ym), None
                    init = (jnp.zeros((self.num_rffs,), x.dtype),
                            jnp.zeros((), x.dtype))
                    xs = (x, m_mask, y) if l is None else (x, l, m_mask, y)
                    out, _ = jax.lax.scan(body, init, xs)
                    return out
                return run
            run = self._get_jit("zty_stacked", build)
            s = self._stacked
            zty, yty = run(self._params(), s["x"], s["l"], s["m"], s["y"])
            return zty, float(yty)

        def build():
            @jax.jit
            def run(params, xb, lb, mb, yb):
                z = feat(params, xb, lb, mb)
                ym = yb * mb
                return _mm(z.T, ym[:, None])[:, 0], ym @ ym
            return run
        run = self._get_jit("zty", build)
        zty = jnp.zeros((self.num_rffs,), dtype=self._dtype)
        yty = jnp.zeros((), dtype=self._dtype)
        params = self._params()
        for xb, yb, lb, mb in self._batches():
            b, c = run(params, xb, lb, mb, yb)
            zty, yty = zty + b, yty + c
        return zty, float(yty)

    def var_design_mat(self, variance_rffs):
        """Z_v^T Z_v over the variance feature columns (the cos/sin pairs
        of the first variance_rffs/2 frequencies -- see ops/layout.py)."""
        feat = self._features
        idx = jnp.asarray(
            self.kernel.variance_column_indices(variance_rffs))

        def build():
            @jax.jit
            def run(params, xb, lb, mb, idx):
                z = jnp.take(feat(params, xb, lb, mb), idx, axis=1)
                return _mm(z.T, z)
            return run
        run = self._get_jit("var_design_mat", build)
        acc = jnp.zeros((variance_rffs, variance_rffs), dtype=self._dtype)
        params = self._params()
        for xb, _, lb, mb in self._batches(with_y=False):
            acc = acc + run(params, xb, lb, mb, idx)
        return acc

    def sketch(self, srht_radem, sample_idx, with_zty=True,
               row_keep_prob=None, seed=123):
        """SRHT sketch pass: acc += SRHT(Z)^T Z, optionally also Z^T y, y^T y
        (rand_nys_constructors.py:96-123) or with row subsampling
        (:60-93)."""
        from ..ops.sorf import srht_rows
        feat = self._features

        def build():
            @jax.jit
            def run(params, xb, lb, mb, yb, radem, idx):
                z = feat(params, xb, lb, mb)
                sz = srht_rows(z, radem, idx)
                acc = _mm(sz.T, z)
                if yb is None:
                    return acc
                ym = yb * mb
                return acc, _mm(z.T, ym[:, None])[:, 0], ym @ ym
            return run
        name = "sketch_y" if with_zty else "sketch"
        run = self._get_jit(name, build)

        rank = sample_idx.shape[0]
        m = self.num_rffs
        acc = jnp.zeros((rank, m), dtype=self._dtype)
        zty = jnp.zeros((m,), dtype=self._dtype) if with_zty else None
        yty = jnp.zeros((), dtype=self._dtype) if with_zty else None
        params = self._params()
        radem = jnp.asarray(srht_radem, self._dtype)
        idx = jnp.asarray(sample_idx)
        if row_keep_prob is not None and row_keep_prob >= 1.0:
            row_keep_prob = None
        rng = np.random.default_rng(seed)
        for xb, yb, lb, mb, mh in self._batches(with_y=with_zty,
                                                host_mask=True):
            if row_keep_prob is not None:
                # Subsample an exact count of real rows by masking
                # (shapes stay static; count matches the reference's
                # per-chunk cutoff, rand_nys_constructors.py:82-84).
                # Computed from the HOST mask copy -- no device sync.
                keep = state_rng.exact_count_keep_mask(
                    mh, row_keep_prob, rng)
                mb = mb * jnp.asarray(keep, dtype=mb.dtype)
            if with_zty:
                a, b, c = run(params, xb, lb, mb, yb, radem, idx)
                acc, zty, yty = acc + a, zty + b, yty + c
            else:
                acc = acc + run(params, xb, lb, mb, None, radem, idx)
        if with_zty:
            return acc, zty, float(yty)
        return acc

    def gauss_pass(self, q_mat):
        """Z^T Z Q for a dense (M, rank) Q (rand_nys_constructors.py:18-36).
        Same reduction as ztzv with a matrix RHS."""
        return self.ztzv(q_mat)

    def classification_loss_grad(self, wvec, lambda_):
        """Softmax cross-entropy loss + gradient over the dataset, with
        L2(lambda^2) regularisation excluding the intercept row
        (nonlinear_cg_toolkit.py:231-275)."""
        feat = self._features

        def batch_loss_grad(params, xb, lb, mb, yb, w):
            z = feat(params, xb, lb, mb)
            pred = _mm(z, w)
            pred = pred - jnp.max(pred, axis=1, keepdims=True)
            p = jnp.exp(pred)
            p = p / jnp.sum(p, axis=1, keepdims=True)
            logp = jnp.log(jnp.clip(p, min=1e-16))
            picked = jnp.take_along_axis(logp, yb[:, None], axis=1)[:, 0]
            loss = -jnp.sum(picked * mb)
            onehot = jax.nn.one_hot(yb, w.shape[1], dtype=z.dtype)
            grad = _mm(z.T, (p - onehot) * mb[:, None])
            return loss, grad

        if self.mode == "stacked":
            def build():
                @jax.jit
                def run(params, x, l, m_mask, y, w):
                    def body(carry, batch):
                        if l is None:
                            xb, mb, yb = batch
                            lb = None
                        else:
                            xb, lb, mb, yb = batch
                        bl, bg = batch_loss_grad(params, xb, lb, mb, yb,
                                                 w)
                        loss, grad = carry
                        return (loss + bl, grad + bg), None
                    init = (jnp.zeros((), w.dtype), jnp.zeros_like(w))
                    xs = (x, m_mask, y) if l is None else (x, l, m_mask, y)
                    out, _ = jax.lax.scan(body, init, xs)
                    return out
                return run
            run = self._get_jit("class_loss_grad_stacked", build)
            s = self._stacked
            w = jnp.asarray(wvec, self._dtype)
            loss, grad = run(self._params(), s["x"], s["l"], s["m"],
                             s["y"], w)
            grad = grad.at[1:, :].add((lambda_ ** 2) * w[1:, :])
            total = float(loss) + 0.5 * (lambda_ ** 2) * \
                float(jnp.sum(w[1:, :] ** 2))
            return grad, total

        def build():
            return jax.jit(batch_loss_grad)
        run = self._get_jit("class_loss_grad", build)

        w = jnp.asarray(wvec, self._dtype)
        grad = jnp.zeros_like(w)
        grad = grad.at[1:, :].add((lambda_ ** 2) * w[1:, :])
        loss = 0.5 * (lambda_ ** 2) * float(jnp.sum(w[1:, :] ** 2))
        params = self._params()
        for xb, yb, lb, mb in self._batches():
            lb_loss, lb_grad = run(params, xb, lb, mb, yb, w)
            loss += float(lb_loss)
            grad = grad + lb_grad
        return grad, loss

    def softmax_linesearch(self, wvec, direction, steps, lambda_):
        """Data-side CE loss of (W + t D) for every candidate step t,
        in ONE dataset pass.

        TPU-first replacement for sequential backtracking: the logits of
        W + t D are affine in t, so each batch computes z W and z D once
        and the loss at the whole step grid falls out of cheap
        elementwise work.  The L2 ridge term is added in closed form by
        the solver (fitting/softmax_solver.py).
        """
        feat = self._features

        def batch_losses(params, xb, lb, mb, yb, w, d, steps):
            z = feat(params, xb, lb, mb)
            zw = _mm(z, w)
            zd = _mm(z, d)
            logits = zw[None, :, :] + steps[:, None, None] * zd[None, :, :]
            lse = jax.nn.logsumexp(logits, axis=2)
            lab = jnp.broadcast_to(yb[None, :, None],
                                   (steps.shape[0], yb.shape[0], 1))
            hit = jnp.take_along_axis(logits, lab, axis=2)[..., 0]
            return jnp.sum((lse - hit) * mb[None, :], axis=1)

        if self.mode == "stacked":
            def build():
                @jax.jit
                def run(params, x, l, m_mask, y, w, d, steps):
                    def body(acc, batch):
                        if l is None:
                            xb, mb, yb = batch
                            lb = None
                        else:
                            xb, lb, mb, yb = batch
                        return acc + batch_losses(params, xb, lb, mb, yb,
                                                  w, d, steps), None
                    init = jnp.zeros((steps.shape[0],), w.dtype)
                    xs = (x, m_mask, y) if l is None else (x, l, m_mask, y)
                    acc, _ = jax.lax.scan(body, init, xs)
                    return acc
                return run
            run = self._get_jit("softmax_ls_stacked", build)
            s = self._stacked
            return run(self._params(), s["x"], s["l"], s["m"], s["y"],
                       jnp.asarray(wvec, self._dtype),
                       jnp.asarray(direction, self._dtype),
                       jnp.asarray(steps, self._dtype))

        def build():
            return jax.jit(batch_losses)
        run = self._get_jit("softmax_ls", build)
        w = jnp.asarray(wvec, self._dtype)
        d = jnp.asarray(direction, self._dtype)
        t = jnp.asarray(steps, self._dtype)
        acc = jnp.zeros((t.shape[0],), self._dtype)
        params = self._params()
        for xb, yb, lb, mb in self._batches():
            acc = acc + run(params, xb, lb, mb, yb, w, d, t)
        return acc

    def _gradient_batch_terms(self, grad_fn):
        """Per-batch accumulation terms for the exact NMLL gradient: one
        traced function computing (Z^T Z, Z^T y, y^T y, dZ^T y, dZ^T Z,
        n_rows) from a masked padded batch.  The per-sigma contractions
        run as einsums on the MXU instead of a host loop of .at[].add."""
        def batch_terms(gparams, xb, lb, mb, yb):
            z, dz = grad_fn(gparams, xb, lb)
            z = z * mb[:, None]
            dz = dz * mb[:, None, None]
            ym = yb * mb
            prec = config.matmul_precision()
            ztz = _mm(z.T, z)
            zty = _mm(z.T, ym[:, None])[:, 0]
            yty = ym @ ym
            dz_ty = jnp.einsum("nmi,n->mi", dz, ym, precision=prec)
            inner = jnp.einsum("nmi,nk->mki", dz, z, precision=prec)
            n = jnp.sum(mb)
            return ztz, zty, yty, dz_ty, inner, n

        return batch_terms

    def _subsample_mask(self, mb, rng, subsample):
        """Bernoulli row-keep mask, applied multiplicatively so shapes
        stay static (nmll_gradient_tools.py:72-86 subsamples rows; the
        count of kept rows is returned via the mask sum)."""
        if subsample >= 1.0:
            return mb
        keep = rng.random(mb.shape[0]) < subsample
        return mb * jnp.asarray(keep, dtype=mb.dtype)

    def gradient_terms(self, subsample=1.0, seed=123):
        """Terms for the exact NMLL gradient (nmll_gradient_tools.py:12-90).

        Returns z_trans_z, z_trans_y, y_trans_y, dz_dsigma_ty, inner_deriv,
        ndatapoints.
        """
        grad_fn = self.kernel.pure_gradient_fn()
        if grad_fn is None:
            return self._gradient_terms_host(subsample, seed)
        m = self.num_rffs
        nsig = self.kernel.get_hyperparams().shape[0] - 1
        dt = self._dtype
        gparams = self.kernel.gradient_params()
        batch_terms = self._gradient_batch_terms(grad_fn)
        rng = np.random.default_rng(seed)

        if self.mode == "stacked":
            def build():
                @jax.jit
                def run(gparams, x, l, m_mask, y):
                    def body(carry, batch):
                        if l is None:
                            xb, mb, yb = batch
                            lb = None
                        else:
                            xb, lb, mb, yb = batch
                        t = batch_terms(gparams, xb, lb, mb, yb)
                        return tuple(c + u for c, u in zip(carry, t)), \
                            None
                    init = (jnp.zeros((m, m), x.dtype),
                            jnp.zeros((m,), x.dtype),
                            jnp.zeros((), x.dtype),
                            jnp.zeros((m, nsig), x.dtype),
                            jnp.zeros((m, m, nsig), x.dtype),
                            jnp.zeros((), x.dtype))
                    xs = (x, m_mask, y) if l is None else (x, l, m_mask, y)
                    out, _ = jax.lax.scan(body, init, xs)
                    return out
                return run
            run = self._get_jit("gradient_terms_stacked", build)
            s = self._stacked
            m_eff = s["m"]
            if subsample < 1.0:
                keep = rng.random(tuple(m_eff.shape)) < subsample
                m_eff = m_eff * jnp.asarray(keep, dtype=m_eff.dtype)
            ztz, zty, yty, dz_ty, inner, n = run(gparams, s["x"], s["l"],
                                                 m_eff, s["y"])
        else:
            def build():
                return jax.jit(batch_terms)
            run = self._get_jit("gradient_terms_stream", build)
            ztz = jnp.zeros((m, m), dtype=dt)
            zty = jnp.zeros((m,), dtype=dt)
            yty = jnp.zeros((), dtype=dt)
            dz_ty = jnp.zeros((m, nsig), dtype=dt)
            inner = jnp.zeros((m, m, nsig), dtype=dt)
            n = jnp.zeros((), dtype=dt)
            for xb, yb, lb, mb in self._batches(with_y=True):
                mb = self._subsample_mask(mb, rng, subsample)
                t = run(gparams, xb, lb, mb, yb)
                ztz, zty, yty, dz_ty, inner, n = (
                    ztz + t[0], zty + t[1], yty + t[2], dz_ty + t[3],
                    inner + t[4], n + t[5])
        inner = inner + jnp.transpose(inner, (1, 0, 2))
        return ztz, zty, float(yty), dz_ty, inner, int(n)

    def _gradient_terms_host(self, subsample=1.0, seed=123):
        """Fallback for kernels without a pure gradient fn: per-chunk
        gradient_x_y on host with einsum accumulation."""
        m = self.num_rffs
        nsig = self.kernel.get_hyperparams().shape[0] - 1
        dt = self._dtype
        ztz = jnp.zeros((m, m), dtype=dt)
        zty = jnp.zeros((m,), dtype=dt)
        yty = 0.0
        dz_ty = jnp.zeros((m, nsig), dtype=dt)
        inner = jnp.zeros((m, m, nsig), dtype=dt)
        nsamples = 0
        rng = np.random.default_rng(seed)
        prec = config.matmul_precision()

        for xb_np, yb_np, lb_np in self.dataset.get_chunked_data():
            if subsample < 1.0:
                idx_size = max(1, int(subsample * xb_np.shape[0]))
                idx = rng.choice(xb_np.shape[0], idx_size, replace=False)
                xb_np = xb_np[idx, ...]
                yb_np = yb_np[idx]
                if lb_np is not None:
                    lb_np = lb_np[idx]
            z, dz, y = self.kernel.gradient_x_y(xb_np, yb_np, lb_np)
            y = y.astype(dt)
            zty = zty + _mm(z.T, y[:, None])[:, 0]
            ztz = ztz + _mm(z.T, z)
            yty += float(y @ y)
            nsamples += z.shape[0]
            dz_ty = dz_ty + jnp.einsum("nmi,n->mi", dz, y, precision=prec)
            inner = inner + jnp.einsum("nmi,nk->mki", dz, z,
                                       precision=prec)
        inner = inner + jnp.transpose(inner, (1, 0, 2))
        return ztz, zty, yty, dz_ty, inner, nsamples
