"""Randomized Nystrom preconditioner construction and application.

Parity with preconditioners/rand_nys_constructors.py and
rand_nys_preconditioners.py in the reference:

- ``initialize_srht``: one SRHT sketch pass -> acc = (S Z)^T Z, then
  C = S acc^T, SVD(C), B = acc^T V^T S^{-1/2} V, eig from SVD(B)^2
  (:221-296).
- ``initialize_srht_multipass`` ("srht_2"): SRHT first pass, then per extra
  pass QR(acc) and a Z^T Z Q matvec pass; numerically shifted Cholesky +
  triangular solve + SVD (:127-218).
- ``srht_ratio_check``: row-subsampled sketch whose min eigenvalue predicts
  the rank needed (eigenvalue interlacing; model_baseclass.py:438-476).
- ``NystromPreconditioner``: P^{-1} v = U ((prefactor / (S + lambda^2)) U^T v)
  + (v - U U^T v); logdet and P^{1/2}-probe helpers for SLQ
  (rand_nys_preconditioners.py:66-119).
"""
import numpy as np
import jax.numpy as jnp

from ..utils import rng as state_rng


def _sketch_state(engine, rank, random_state):
    radem, idx = state_rng.srht_state(random_state, engine.num_rffs, rank,
                                      np.float64)
    return radem, idx


def _tall_svd(b):
    """(U, singular values) of a tall-skinny (M, r) matrix via eigh of
    the (r, r) gram matrix -- far cheaper than SVD on TPU.  Squares the
    condition number, which is fine for preconditioner construction
    (the reference's multipass path makes the same trade via Cholesky,
    rand_nys_constructors.py:198-213)."""
    g = jnp.matmul(b.T, b, precision="highest")
    ev, v = jnp.linalg.eigh(g)
    ev = jnp.clip(ev[::-1], min=0.0)
    v = v[:, ::-1]
    s = jnp.sqrt(ev)
    inv_s = jnp.where(s > 1e-14, 1.0 / jnp.where(s > 1e-14, s, 1.0), 0.0)
    u = jnp.matmul(b, v * inv_s[None, :], precision="highest")
    return u, s


def _nystrom_from_sketch(acc, radem, idx):
    """Shared tail of the single-pass construction: sketch-SVD + whitening."""
    from ..ops.sorf import srht_rows
    c_mat = srht_rows(acc, jnp.asarray(radem, acc.dtype), jnp.asarray(idx))
    _, c_s1, c_v1 = jnp.linalg.svd(c_mat, full_matrices=False)
    mask = c_s1 < 1e-14
    c_s1 = 1.0 / jnp.sqrt(jnp.clip(c_s1, min=1e-14))
    c_s1 = jnp.where(mask, 0.0, c_s1)
    b = acc.T @ c_v1.T @ (c_s1[:, None] * c_v1)
    u_mat, s_mat = _tall_svd(b)
    return u_mat, s_mat ** 2


def initialize_srht(engine, rank, random_state, is_regression=True):
    """One-pass randomized Nystrom approximation."""
    radem, idx = _sketch_state(engine, rank, random_state)
    if is_regression:
        acc, z_trans_y, y_trans_y = engine.sketch(radem, idx, with_zty=True)
    else:
        acc = engine.sketch(radem, idx, with_zty=False)
        z_trans_y, y_trans_y = None, 0.0
    u_mat, eig = _nystrom_from_sketch(acc, radem, idx)
    return u_mat, eig, z_trans_y, y_trans_y


def initialize_srht_multipass(engine, rank, random_state, n_passes=2,
                              is_regression=True):
    """Multi-pass construction: SRHT sketch then Z^T Z Q power passes."""
    radem, idx = _sketch_state(engine, rank, random_state)
    if is_regression:
        acc, z_trans_y, y_trans_y = engine.sketch(radem, idx, with_zty=True)
    else:
        acc = engine.sketch(radem, idx, with_zty=False)
        z_trans_y, y_trans_y = None, 0.0

    acc = acc.T  # (M, rank)
    q_mat = None
    for _ in range(n_passes - 1):
        q_mat, _ = jnp.linalg.qr(acc)
        acc = engine.gauss_pass(q_mat)

    # Whiten acc by small^{-1/2} where small = Q^T Z^T Z Q.  The
    # reference does this with a spacing()-shifted Cholesky + triangular
    # solve (rand_nys_constructors.py:198-213) -- safe in fp64 LAPACK,
    # but in fp32 an absolute-ULP shift cannot keep a near-singular
    # `small` positive definite (extreme-but-legitimate hyperparameters,
    # e.g. sigma -> 0, make the sketch numerically rank-1), the Cholesky
    # returns NaN, and downstream eigh on NaN input livelocks the TPU.
    # Instead use pinv-style eigh whitening: identical left singular
    # pairs in exact arithmetic (acc small^{-1} acc^T is what the SVD
    # sees either way), and directions below fp noise are dropped
    # rather than amplified.  fp32 must never NaN.
    small = q_mat.T @ acc
    e_val, e_vec = jnp.linalg.eigh(small)
    floor = jnp.clip(e_val[-1], min=0.0) * (
        np.finfo(acc.dtype).eps * small.shape[0])
    inv_sqrt = jnp.where(e_val > floor,
                         1.0 / jnp.sqrt(jnp.where(e_val > floor,
                                                  e_val, 1.0)), 0.0)
    acc = jnp.matmul(acc, e_vec * inv_sqrt[None, :], precision="highest")
    u_mat, s_mat = _tall_svd(acc)
    eig = jnp.clip(s_mat ** 2, min=0)
    return u_mat, eig, z_trans_y, y_trans_y


def srht_ratio_check(engine, rank, random_state, sample_frac=0.1):
    """Estimate preconditioner eigvals from a row subsample
    (rand_nys_constructors.py:301-357)."""
    radem, idx = _sketch_state(engine, rank, random_state)
    acc = engine.sketch(radem, idx, with_zty=False,
                        row_keep_prob=sample_frac, seed=random_state)
    _, eig = _nystrom_from_sketch(acc, radem, idx)
    return eig


class NystromPreconditioner:
    """Randomized Nystrom approximation to (Z^T Z + lambda^2 I)^{-1}."""

    def __init__(self, engine, max_rank, verbose=False, random_state=123,
                 method="srht", is_regression=True):
        if method not in ("srht", "srht_2", "srht_3"):
            raise RuntimeError("Unknown preconditioner construction method.")

        if method.startswith("srht_"):
            n_passes = int(method.split("_")[1])
            u_mat, eig, zty, yty = initialize_srht_multipass(
                engine, max_rank, random_state, n_passes, is_regression)
        else:
            u_mat, eig, zty, yty = initialize_srht(
                engine, max_rank, random_state, is_regression)

        lambda_ = engine.kernel.get_lambda()
        min_eig = float(eig.min())
        self.u_mat = u_mat
        self.eig = eig + lambda_ ** 2
        inv_eig = jnp.where(self.eig > 1e-14, 1.0 / self.eig, 0.0)
        self.inv_eig = inv_eig
        self.achieved_ratio = min_eig / lambda_ ** 2
        self.prefactor = float(min_eig + lambda_ ** 2)
        self.z_trans_y = zty
        self.y_trans_y = yty

    def _reweight_range(self, vec, spectrum):
        """Apply U diag(spectrum) U^T + (I - U U^T) to (M, K) columns.

        Every preconditioner action is the same rank-structured operator
        with a different spectrum on the captured subspace: split ``vec``
        into its coordinates in the range of U plus an orthogonal
        remainder, rescale the range coordinates by ``spectrum``, and
        pass the remainder through untouched.
        """
        coords = jnp.matmul(self.u_mat.T, vec, precision="highest")
        remainder = vec - jnp.matmul(self.u_mat, coords,
                                     precision="highest")
        return remainder + jnp.matmul(self.u_mat,
                                      spectrum[:, None] * coords,
                                      precision="highest")

    def batch_matvec(self, xvec):
        """P^{-1} @ xvec for (M, K) columns."""
        return self._reweight_range(xvec, self.prefactor * self.inv_eig)

    def rev_batch_matvec(self, xvec):
        """P @ xvec (non-inverted)."""
        return self._reweight_range(xvec, self.eig / self.prefactor)

    def get_rank(self):
        return int(self.inv_eig.shape[0])

    def to_state(self):
        """Numpy snapshot sufficient to rebuild this object without an
        engine or any dataset pass -- lets a long fit survive a process
        restart by persisting the built preconditioner to disk."""
        state = {"u_mat": np.asarray(self.u_mat),
                 "eig": np.asarray(self.eig),
                 "achieved_ratio": np.float64(self.achieved_ratio),
                 "prefactor": np.float64(self.prefactor),
                 "y_trans_y": np.float64(self.y_trans_y)}
        if self.z_trans_y is not None:
            state["z_trans_y"] = np.asarray(self.z_trans_y)
        return state

    @classmethod
    def from_state(cls, state):
        """Rebuild from a ``to_state`` snapshot (e.g. ``np.load`` of an
        ``.npz`` the snapshot was saved into)."""
        self = cls.__new__(cls)
        self.u_mat = jnp.asarray(state["u_mat"])
        self.eig = jnp.asarray(state["eig"])
        self.inv_eig = jnp.where(self.eig > 1e-14, 1.0 / self.eig, 0.0)
        self.achieved_ratio = float(state["achieved_ratio"])
        self.prefactor = float(state["prefactor"])
        self.y_trans_y = float(state["y_trans_y"])
        zty = state["z_trans_y"] if "z_trans_y" in state else None
        self.z_trans_y = None if zty is None else jnp.asarray(zty)
        return self

    def get_logdet(self):
        """log det P, used to correct SLQ logdet estimates
        (rand_nys_preconditioners.py:96-102)."""
        logdet = 1 + (self.eig - self.prefactor) / self.prefactor
        return float(jnp.sum(jnp.log(jnp.clip(logdet, min=1e-12))))

    def matvec_for_sampling(self, xvec):
        """P^{1/2} @ xvec, for drawing N(0, P) probes
        (rand_nys_preconditioners.py:105-119)."""
        root_spectrum = jnp.sqrt(jnp.clip(self.eig, min=0)
                                 / self.prefactor)
        return self._reweight_range(xvec, root_spectrum)

    def get_zty(self):
        return self.z_trans_y

    def get_yty(self):
        return float(self.y_trans_y)
