"""Multi-host (multi-process) execution helpers.

SURVEY.md section 2.9 requires a mesh/device runtime over ICI/DCN using
jax.distributed.  Single-host multi-chip needs nothing special (the
ShardedEngine shards over local devices); across hosts each process:

1. calls ``initialize_distributed(coordinator, n_procs, proc_id)``;
2. builds its LOCAL portion of the dataset (e.g. its slice of the .npy
   file list) -- every host must use the same chunk_size and batch count
   per host;
3. constructs the mesh over ``jax.devices()`` (global) and uses
   ``host_local_stack_to_global`` to assemble globally-sharded stacks
   from per-host data.

All projection state derives from the shared integer seed, so no state
needs to be broadcast (utils/rng.py).
"""
import numpy as np
import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, data_mesh


def initialize_distributed(coordinator_address, num_processes, process_id,
                           local_device_ids=None):
    """Thin wrapper over jax.distributed.initialize."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)


def global_data_mesh():
    """A 1-D data mesh over every device in the (multi-host) job."""
    return data_mesh()


def global_host_reduce(values, ops, mesh=None):
    """Reduce a small tuple of per-host scalars across every host.

    One tiny collective per call: each host replicates its scalars over
    its local devices, the stacks assemble into a global array, and a
    shard_map applies ``psum`` / ``pmax`` columnwise.  Engines use this
    to agree on stream geometry (row totals, superbatch counts, ragged
    sequence-axis maxima) before building any data program.

    Args:
        values: sequence of python floats (this host's contribution).
        ops: matching sequence of "sum" or "max".
        mesh: the global data mesh (defaults to all devices).

    Returns:
        List of floats, the global reductions, identical on every host.
        Single-process runs return ``values`` unchanged (no program).
    """
    if len(values) != len(ops):
        raise ValueError("values and ops must pair up")
    if jax.process_count() == 1:
        return [float(v) for v in values]
    mesh = mesh if mesh is not None else global_data_mesh()
    n_local = jax.local_device_count()
    # "sum" splits this host's value over its local devices so the
    # all-device psum totals exactly sum-over-hosts; "max" replicates.
    per_dev = np.stack([
        np.full((n_local,), float(v) / n_local if op == "sum"
                else float(v))
        for v, op in zip(values, ops)], axis=1)
    arr = host_local_stack_to_global(per_dev, mesh)

    fn = _host_reduce_program(tuple(ops), mesh)
    out = np.asarray(fn(arr))
    return [float(out[0, i]) for i in range(len(ops))]


_HOST_REDUCE_PROGRAMS = {}


def _host_reduce_program(ops, mesh):
    """Memoized jitted columnwise psum/pmax (a fresh closure per call
    would retrace, and each remote compile costs minutes on the relay)."""
    import jax.numpy as jnp
    from jax import shard_map as _sm
    key = (ops, mesh)
    fn = _HOST_REDUCE_PROGRAMS.get(key)
    if fn is None:
        def reduce_cols(x):
            cols = [jax.lax.psum(x[:, i], DATA_AXIS) if op == "sum"
                    else jax.lax.pmax(x[:, i], DATA_AXIS)
                    for i, op in enumerate(ops)]
            return jnp.stack(cols, axis=1)

        fn = jax.jit(_sm(reduce_cols, mesh=mesh, check_vma=False,
                         in_specs=P(DATA_AXIS), out_specs=P()))
        _HOST_REDUCE_PROGRAMS[key] = fn
    return fn


def host_local_stack_to_global(local_stack, mesh=None):
    """Assemble a globally-sharded array from per-host batch stacks.

    Args:
        local_stack: this host's (local_batches, ...) numpy array.  Every
            host must supply the same local_batches count (pad with
            all-masked batches as ShardedEngine does).
        mesh: the global data mesh (defaults to all devices).

    Returns:
        A jax.Array sharded over the mesh's data axis whose global shape
        is (local_batches * num_processes, ...).
    """
    mesh = mesh if mesh is not None else global_data_mesh()
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    local_stack = np.asarray(local_stack)
    if jax.process_count() == 1:
        return jax.device_put(local_stack, sharding)
    return jax.make_array_from_process_local_data(sharding, local_stack)
