"""Fully-fused preconditioned CG: the whole solver as ONE device program.

The reference's CG is a Python loop whose every iteration re-streams the
dataset and issues many small array ops (cg_tools.py:57-156).  Here the
complete batched-RHS PCG -- matvec scan, preconditioner application,
alpha/beta updates, convergence test -- compiles into a single
``lax.while_loop``, so a fit is one dispatch regardless of iteration
count.  On meshes the same loop runs inside ``shard_map``: data stays
sharded, vector iterates are computed replicated, and the matvec partials
are psum'd each iteration.

SLQ support: per-iteration (alpha, beta) pairs land in preallocated
(max_iter, K) buffers via dynamic_update_slice, then are trimmed on host.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..ops.contract import (mm as _mm,
                            parts_contract as _parts_contract)
from ..ops.contract import ztzv_contract as _ztzv_contract_shared


def _ztzv_contract(z, v):
    return _ztzv_contract_shared(z, v, feature_path=True)


def _precond_mv(u_mat, inv_eig, prefactor, v):
    xp = _mm(u_mat.T, v)
    return (v - _mm(u_mat, xp)) + _mm(u_mat,
                                      inv_eig[:, None] * prefactor * xp)


def _cg_while(matvec, precond, rhs, lam, max_iter, tol, col_sum=None):
    """Shared PCG while_loop body; matvec/precond are traced callables.

    col_sum(a) reduces (M, K) -> (K,) over the M axis; the default is a
    local jnp.sum, and M-sharded callers pass a psum-augmented reduction
    so inner products are global while iterates stay sharded.

    Breakdown safety (essential in float32 on near-singular systems): each
    RHS column carries an 'active' flag.  A column is frozen when it
    converges OR when CG breaks down for it (non-positive/non-finite
    curvature p^T A p or residual energy r^T P^-1 r -- impossible in exact
    arithmetic, routine in fp32 at extreme hyperparameters).  Frozen
    columns stop updating (alpha = beta = 0) so they can never poison the
    others with NaNs; recorded zero alphas mark where each column's
    Lanczos sequence ended for SLQ truncation.
    """
    m, k = rhs.shape
    if col_sum is None:
        col_sum = lambda a: jnp.sum(a, axis=0)
    init_norms = jnp.sqrt(col_sum(rhs * rhs))
    z0 = precond(rhs)
    rz0 = col_sum(rhs * z0)

    state = {
        "x": jnp.zeros_like(rhs),
        "r": rhs,
        "p": z0,
        "rz": rz0,
        "active": jnp.ones((k,), jnp.bool_),
        "converged": jnp.zeros((k,), jnp.bool_),
        "niter": jnp.zeros((), jnp.int32),
        "alphas": jnp.zeros((max_iter, k), rhs.dtype),
        "betas": jnp.zeros((max_iter, k), rhs.dtype),
        "errs": jnp.zeros((max_iter,), rhs.dtype),
    }

    def cond(s):
        return jnp.logical_and(jnp.any(s["active"]),
                               s["niter"] < max_iter)

    def body(s):
        # 'active' == not broken down; converged columns keep iterating
        # (matching the reference, whose loop only exits globally) so SLQ
        # probes accumulate full-length Lanczos sequences.
        active = s["active"]
        w = matvec(s["p"]) + (lam ** 2) * s["p"]
        pw = col_sum(s["p"] * w)
        alpha_raw = s["rz"] / pw
        bad = jnp.logical_or(~jnp.isfinite(alpha_raw), pw <= 0)
        active = jnp.logical_and(active, ~bad)
        alpha = jnp.where(active, alpha_raw, 0.0)
        x = s["x"] + alpha[None, :] * s["p"]
        r = s["r"] - alpha[None, :] * w
        err = jnp.sqrt(col_sum(r * r)) / init_norms
        converged = jnp.logical_or(s["converged"], err < tol)

        z = precond(r)
        rz_next = col_sum(r * z)
        # Non-positive preconditioned residual energy == fp breakdown.
        active = jnp.logical_and(active, rz_next > 0)
        beta = jnp.where(active, rz_next / s["rz"], 0.0)
        p = jnp.where(active[None, :], z + beta[None, :] * s["p"],
                      s["p"])
        # Global exit once every non-broken column is converged.
        all_done = jnp.all(jnp.logical_or(converged, ~active))
        active = jnp.logical_and(active, ~all_done)
        i = s["niter"]
        return {
            "x": x, "r": r, "p": p, "rz": rz_next,
            "active": active,
            "converged": converged,
            "niter": i + 1,
            "alphas": jax.lax.dynamic_update_slice(
                s["alphas"], alpha[None, :], (i, jnp.int32(0))),
            "betas": jax.lax.dynamic_update_slice(
                s["betas"], beta[None, :], (i, jnp.int32(0))),
            "errs": jax.lax.dynamic_update_slice(
                s["errs"], err[:1], (i,)),
        }

    out = jax.lax.while_loop(cond, body, state)
    done = jnp.all(out["converged"])
    return (out["x"], done, out["niter"], out["alphas"],
            out["betas"], out["errs"])


# ----------------------------------------------------------------------
# single-device (stacked Engine)
def fused_cg_solve_stacked(engine, rhs, lam, precond=None, max_iter=200,
                           tol=1e-4):
    feature_fn = engine.fn
    num_rffs = engine.num_rffs
    s = engine._stacked
    has_l = s["l"] is not None
    parts_fn = engine.kernel.pure_feature_parts_fn()
    ztzv_fn = engine.kernel.pure_ztzv_parts_fn()
    positions = engine.kernel.feature_positions() if parts_fn else None
    if positions is not None:
        cos_pos = jnp.asarray(positions[0])
        sin_pos = jnp.asarray(positions[1])

    def build():
        @partial(jax.jit, static_argnames=("max_iter",))
        def run(params, x, l, m, rhs, lam, u_mat, inv_eig, prefactor,
                tol, max_iter):
            def matvec_canonical(v):
                def body(acc, batch):
                    if has_l:
                        xb, lb, mb = batch
                    else:
                        xb, mb = batch
                        lb = None
                    z = feature_fn(params, xb, lb) * mb[:, None]
                    return acc + _ztzv_contract(z, v), None
                init = jnp.zeros((num_rffs, v.shape[-1]), v.dtype)
                xs = (x, l, m) if has_l else (x, m)
                acc, _ = jax.lax.scan(body, init, xs)
                return acc

            def matvec_parts(v):
                # Permutation-invariant contraction on (cos, sin) parts:
                # only the small (M, K) vectors are gathered/scattered.
                v_c = jnp.take(v, cos_pos, axis=0)
                v_s = jnp.take(v, sin_pos, axis=0)

                def body(acc, batch):
                    if has_l:
                        xb, lb, mb = batch
                    else:
                        xb, mb = batch
                        lb = None
                    fused = None
                    if ztzv_fn is not None:
                        fused = ztzv_fn(params, xb, lb, mb, v_c, v_s)
                    if fused is not None:
                        oc, os = fused
                    else:
                        c, si = parts_fn(params, xb, lb)
                        c = c * mb[:, None]
                        si = si * mb[:, None]
                        oc, os = _parts_contract(c, si, v_c, v_s)
                    return (acc[0] + oc, acc[1] + os), None
                f = cos_pos.shape[0]
                init = (jnp.zeros((f, v.shape[-1]), v.dtype),
                        jnp.zeros((f, v.shape[-1]), v.dtype))
                xs = (x, l, m) if has_l else (x, m)
                (oc, os), _ = jax.lax.scan(body, init, xs)
                out = jnp.zeros_like(v)
                out = out.at[cos_pos].set(oc)
                out = out.at[sin_pos].set(os)
                return out

            matvec = matvec_parts if positions is not None \
                else matvec_canonical

            if u_mat is None:
                precond_fn = lambda v: v
            else:
                precond_fn = partial(_precond_mv, u_mat, inv_eig,
                                     prefactor)
            return _cg_while(matvec, precond_fn, rhs, lam, max_iter, tol)
        return run

    run = engine._get_jit("fused_cg", build)
    if precond is None:
        u_mat, inv_eig, prefactor = None, None, None
    else:
        u_mat = precond.u_mat
        inv_eig = precond.inv_eig
        prefactor = jnp.asarray(precond.prefactor, rhs.dtype)
    rhs = jnp.asarray(rhs)
    return run(engine._params(), s["x"], s["l"], s["m"], rhs,
               jnp.asarray(lam, rhs.dtype), u_mat, inv_eig, prefactor,
               jnp.asarray(tol, rhs.dtype), max_iter=max_iter)


# ----------------------------------------------------------------------
# multi-device (ShardedEngine): the whole loop runs inside shard_map.
def fused_cg_solve_sharded(engine, rhs, lam, precond=None, max_iter=200,
                           tol=1e-4):
    from .. import config as _cfg
    if _cfg.use_m_sharding(engine.num_rffs, engine.n_dev):
        return fused_cg_solve_msharded(engine, rhs, lam, precond,
                                       max_iter, tol)
    from ..parallel.mesh import DATA_AXIS
    feature_fn = engine.fn
    num_rffs = engine.num_rffs
    parts_fn = engine.kernel.pure_feature_parts_fn()
    ztzv_fn = engine.kernel.pure_ztzv_parts_fn()
    positions = engine.kernel.feature_positions() if parts_fn else None
    if positions is not None:
        cos_pos = jnp.asarray(positions[0])
        sin_pos = jnp.asarray(positions[1])

    def build():
        mi = max_iter

        def local(params, x, l, m, rhs, lam, u_mat, inv_eig, prefactor,
                  tol):
            def matvec_canonical(v):
                def body(acc, batch):
                    xb, lb, mb = batch
                    z = feature_fn(params, xb, lb) * mb[:, None]
                    return acc + _ztzv_contract(z, v), None
                init = jnp.zeros((num_rffs, v.shape[-1]), v.dtype)
                acc, _ = jax.lax.scan(body, init, (x, l, m))
                return jax.lax.psum(acc, DATA_AXIS)

            def matvec_parts(v):
                v_c = jnp.take(v, cos_pos, axis=0)
                v_s = jnp.take(v, sin_pos, axis=0)

                def body(acc, batch):
                    xb, lb, mb = batch
                    fused = None
                    if ztzv_fn is not None:
                        fused = ztzv_fn(params, xb, lb, mb, v_c, v_s)
                    if fused is not None:
                        oc, os = fused
                    else:
                        c, si = parts_fn(params, xb, lb)
                        c = c * mb[:, None]
                        si = si * mb[:, None]
                        oc, os = _parts_contract(c, si, v_c, v_s)
                    return (acc[0] + oc, acc[1] + os), None
                f = cos_pos.shape[0]
                init = (jnp.zeros((f, v.shape[-1]), v.dtype),
                        jnp.zeros((f, v.shape[-1]), v.dtype))
                (oc, os), _ = jax.lax.scan(body, init, (x, l, m))
                out = jnp.zeros_like(v)
                out = out.at[cos_pos].set(oc)
                out = out.at[sin_pos].set(os)
                return jax.lax.psum(out, DATA_AXIS)

            matvec = matvec_parts if positions is not None \
                else matvec_canonical

            if u_mat is None:
                precond_fn = lambda v: v
            else:
                precond_fn = partial(_precond_mv, u_mat, inv_eig,
                                     prefactor)
            return _cg_while(matvec, precond_fn, rhs, lam, mi, tol)

        data_specs = (P(DATA_AXIS),) * 3
        rep = (P(),) * 6
        fn = shard_map(local, mesh=engine.mesh, check_vma=False,
                       in_specs=(P(),) + data_specs + rep,
                       out_specs=(P(),) * 6)
        return jax.jit(fn)

    # max_iter is baked into the shard_map closure; the jit cache is keyed
    # on it so different limits compile separately.
    run = engine._get_jit(f"fused_cg_{max_iter}", build)

    if precond is None:
        # shard_map in_specs are positional; pass dummy zero arrays and a
        # sentinel prefactor < 0 meaning "no preconditioner".
        u_mat = jnp.zeros((num_rffs, 1), rhs.dtype)
        inv_eig = jnp.zeros((1,), rhs.dtype)
        prefactor = jnp.asarray(0.0, rhs.dtype)
    else:
        u_mat = precond.u_mat
        inv_eig = precond.inv_eig
        prefactor = jnp.asarray(precond.prefactor, rhs.dtype)
    if precond is None:
        # Zero u_mat makes _precond_mv the identity: v - U(U^T v) + ... = v.
        pass
    return run(engine._params(), engine._x, engine._l, engine._m,
               jnp.asarray(rhs), jnp.asarray(lam, rhs.dtype), u_mat,
               inv_eig, prefactor, jnp.asarray(tol, rhs.dtype))


# ----------------------------------------------------------------------
# M-sharded multi-device solver: CG iterates, residuals and the Nystrom
# preconditioner factor U are sharded over the feature (M) axis of the
# SAME 1-D mesh whose batch axis shards the data.  Per iteration:
#   v_full   = all_gather(v_shard)                 (M tiny vs data)
#   partial  = scan_batches Z_local^T (Z_local v)  (full-M transient)
#   v_next   = reduce_scatter(partial)             (back to the shard)
# P^{-1} on shards: U_shard^T v_shard partials psum'd to the (rank, K)
# inner product, then U_shard maps back -- so the (M, rank) factor, the
# largest solver-state array at num_rffs >~ 32k, never exists replicated
# inside the loop.  (Required addition per SURVEY.md section 2.9 /
# BASELINE north star; the reference has no distributed backend.)
def fused_cg_solve_msharded(engine, rhs, lam, precond=None, max_iter=200,
                            tol=1e-4):
    from ..parallel.mesh import DATA_AXIS
    from jax.sharding import NamedSharding
    feature_fn = engine.fn
    num_rffs = engine.num_rffs
    n_dev = engine.n_dev
    assert num_rffs % n_dev == 0, \
        "M-sharding requires num_rffs divisible by the mesh size."

    def build():
        mi = max_iter

        def local(params, x, l, m, rhs_s, lam, u_mat_s, inv_eig,
                  prefactor, tol):
            def col_sum(a):
                return jax.lax.psum(jnp.sum(a, axis=0), DATA_AXIS)

            def matvec(v_shard):
                v_full = jax.lax.all_gather(v_shard, DATA_AXIS, axis=0,
                                            tiled=True)

                def body(acc, batch):
                    xb, lb, mb = batch
                    z = feature_fn(params, xb, lb) * mb[:, None]
                    return acc + _ztzv_contract(z, v_full), None
                init = jnp.zeros((num_rffs, v_shard.shape[-1]),
                                 v_shard.dtype)
                acc, _ = jax.lax.scan(body, init, (x, l, m))
                return jax.lax.psum_scatter(acc, DATA_AXIS,
                                            scatter_dimension=0,
                                            tiled=True)

            def precond_fn(v_shard):
                # With the no-preconditioner zero U sentinel this reduces
                # to the identity exactly: v - U(U^T v) + ... = v.
                xp = jax.lax.psum(_mm(u_mat_s.T, v_shard), DATA_AXIS)
                return (v_shard - _mm(u_mat_s, xp)) + \
                    _mm(u_mat_s, inv_eig[:, None] * prefactor * xp)

            return _cg_while(matvec, precond_fn, rhs_s, lam, mi, tol,
                             col_sum=col_sum)

        data_specs = (P(DATA_AXIS),) * 3
        # rhs and U sharded over M (their axis 0); scalars replicated.
        fn = shard_map(local, mesh=engine.mesh, check_vma=False,
                       in_specs=(P(),) + data_specs +
                       (P(DATA_AXIS), P(), P(DATA_AXIS), P(), P(), P()),
                       out_specs=(P(DATA_AXIS),) + (P(),) * 5)
        return jax.jit(fn)

    run = engine._get_jit(f"fused_cg_m_{max_iter}", build)

    if precond is None:
        u_mat = jnp.zeros((num_rffs, 1), rhs.dtype)
        inv_eig = jnp.zeros((1,), rhs.dtype)
        prefactor = jnp.asarray(0.0, rhs.dtype)
    else:
        u_mat = precond.u_mat
        inv_eig = precond.inv_eig
        prefactor = jnp.asarray(precond.prefactor, rhs.dtype)
    return run(engine._params(), engine._x, engine._l, engine._m,
               jnp.asarray(rhs), jnp.asarray(lam, rhs.dtype), u_mat,
               inv_eig, prefactor, jnp.asarray(tol, rhs.dtype))
