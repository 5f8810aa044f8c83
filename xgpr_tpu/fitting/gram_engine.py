"""Exact-Gram engine: the CG/SLQ data surface backed by a cached Z^T Z.

Every solver and preconditioner in this package touches the dataset only
through four reductions -- ``ztzv`` (Z^T Z v), ``gauss_pass`` (same with
a matrix RHS), ``zty`` (Z^T y, y^T y) and ``sketch`` ((S Z)^T Z for a
feature-side SRHT S).  All four are linear images of the Gram matrix
G = Z^T Z:

    ztzv(v)             = G v
    gauss_pass(Q)       = G Q
    sketch(radem, idx)  = (G W)^T  with W the SRHT map (G symmetric)

so once G, Z^T y and y^T y have been accumulated in ONE dataset pass
(``Engine.design_mat``), an estimator run against this engine is
bit-for-bit the same algorithm as a run that re-streams features every
iteration -- at O(M^2) per matvec instead of O(N M).

Built for reference-grade verification: at n ~ 1e6 the fp32 feature /
accumulation noise floor can exceed an interior lambda^2 (the top Gram
eigenvalue is O(1e7) while lambda^2 ~ 0.05 -- measured on the motif
north-star corpus), so single-precision SLQ and exact NMLL both carry
an operator perturbation far above the gate tolerance.  Accumulating G
once in float64 on host (jax_enable_x64) and scoring SLQ against the
float64 Cholesky through THIS engine separates estimator error from
arithmetic error.  The reference's exact path makes the same choice --
fp64 LAPACK on host (exact_nmll_calcs.py) -- this extends it to the
stochastic estimator.
"""
import jax.numpy as jnp


class GramEngine:
    """Engine facade over a precomputed (Z^T Z, Z^T y, y^T y) triple.

    Accepts the output of ``Engine.design_mat()`` plus the kernel and
    row count; usable anywhere a fitting engine is (ConjugateGrad,
    NystromPreconditioner, scoring.slq.slq_nmll_from_engine).
    """

    def __init__(self, gram, z_trans_y, y_trans_y, kernel, ndatapoints):
        self.gram = jnp.asarray(gram)
        self._zty = jnp.asarray(z_trans_y)
        self._yty = float(y_trans_y)
        self.kernel = kernel
        self.ndatapoints = int(ndatapoints)
        self.num_rffs = int(self.gram.shape[0])

    def ztzv(self, vec):
        return jnp.matmul(self.gram, vec, precision="highest")

    def gauss_pass(self, q_mat):
        return self.ztzv(q_mat)

    def zty(self):
        return self._zty, self._yty

    def design_mat(self):
        return self.gram, self._zty, self._yty

    def sketch(self, srht_radem, sample_idx, with_zty=True,
               row_keep_prob=None, seed=123):
        if row_keep_prob is not None and row_keep_prob < 1.0:
            raise RuntimeError(
                "A cached Gram matrix determines every feature-side "
                "reduction exactly, but row subsampling acts on the "
                "dataset axis, which the Gram has already summed out. "
                "Run ratio checks against a streaming engine instead.")
        from ..ops.sorf import srht_rows
        acc = srht_rows(self.gram, jnp.asarray(srht_radem, self.gram.dtype),
                        jnp.asarray(sample_idx)).T
        if with_zty:
            return acc, self._zty, self._yty
        return acc
