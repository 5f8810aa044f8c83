"""Shared matmul / matvec contraction helpers.

One home for the precision-pinned contractions every reduction uses
(previously duplicated across fitting/engine.py, fitting/fused_cg.py and
parallel/sharded.py).  TPU default matmul precision silently rounds
operands to bfloat16, so every matmul on the compute path goes through
these wrappers, which read the config precision knobs at trace time.
"""
import jax
import jax.numpy as jnp

from .. import config


def mm(a, b):
    """Solve-path matmul: pinned to config.matmul_precision() (default
    HIGHEST -- full fp32 accuracy on TPU via 6 bf16 passes)."""
    return jnp.matmul(a, b, precision=config.matmul_precision())


def fmm(a, b):
    """Feature-path matmul: the SORF projection and CG-matvec
    contractions run at config.feature_precision() (default "high",
    3-pass bf16, ~5e-7 relative error -- far inside the 1e-3 fp32
    feature contract and ~2x cheaper than HIGHEST)."""
    return jnp.matmul(a, b, precision=config.feature_precision())


def ztzv_contract(z, v, feature_path=False):
    """Z^T (Z v) with optional bf16 feature materialisation
    (config.set_feature_dtype): halves the dominant HBM traffic of the
    matvec; accumulation stays float32.

    feature_path selects the cheaper feature-precision matmuls (used by
    the fused CG hot loop); reductions that feed factorizations keep the
    solve-path precision.
    """
    fd = config.feature_dtype()
    if fd is not None:
        zb = z.astype(fd)
        zv = jnp.matmul(zb, v.astype(fd),
                        preferred_element_type=jnp.float32)
        return jnp.matmul(zb.T, zv.astype(fd),
                          preferred_element_type=jnp.float32)
    contract = fmm if feature_path else mm
    return contract(z.T, contract(z, v))


def parts_contract(c, s, v_c, v_s):
    """Z^T (Z v) from (cos, sin) feature parts: zv = c v_c + s v_s, then
    (c^T zv, s^T zv).  Avoids the canonical-layout assembly copies."""
    fd = config.feature_dtype()
    if fd is not None:
        c, s = c.astype(fd), s.astype(fd)
        zv = (jnp.matmul(c, v_c.astype(fd),
                         preferred_element_type=jnp.float32)
              + jnp.matmul(s, v_s.astype(fd),
                           preferred_element_type=jnp.float32))
        zvb = zv.astype(fd)
        return (jnp.matmul(c.T, zvb, preferred_element_type=jnp.float32),
                jnp.matmul(s.T, zvb, preferred_element_type=jnp.float32))
    zv = fmm(c, v_c) + fmm(s, v_s)
    return fmm(c.T, zv), fmm(s.T, zv)
