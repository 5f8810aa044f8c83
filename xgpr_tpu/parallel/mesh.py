"""Device-mesh helpers for multi-chip execution.

The reference has no distributed backend (SURVEY.md section 2.9); scaling
here is TPU-native: a 1-D 'data' mesh over all chips, dataset batches
sharded over it, and every chunk reduction psum'd over ICI.
"""
import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def data_mesh(n_devices=None, devices=None):
    """A 1-D mesh over the data axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh):
    """Shard the leading (batch) axis over the data mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh):
    return NamedSharding(mesh, P())
