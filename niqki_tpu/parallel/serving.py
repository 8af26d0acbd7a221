"""Multi-chip index serving: the engine's distributed query path.

ShardedIndex places a SketchIndex's dense (G, F) fingerprint matrix
row-sharded over the mesh's 'tp' axis (each chip owns a contiguous genome
range — the TP analog of sharding NIQKI's bucket table) and runs hit
counting under shard_map with query batches sharded over 'dp'. Count blocks
land sharded over both axes and are gathered once per batch.

Multi-host: call `init_distributed()` (jax.distributed) on every host before
building the mesh; the same code then spans hosts with DCN collectives —
there is no other code path to maintain.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index import SketchIndex
from .mesh import make_mesh, default_mesh_shape
from .sharded import sharded_count


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize the multi-host JAX runtime (no-op for single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


class ShardedIndex:
    """Row-sharded device-resident index for batched multi-chip queries."""

    def __init__(self, index: SketchIndex, mesh: Mesh | None = None):
        if mesh is None:
            devs = jax.devices()
            dp, tp = default_mesh_shape(len(devs))
            mesh = make_mesh(devs, dp=dp, tp=tp)
        self.mesh = mesh
        self.params = index.params
        self.names = list(index.names)
        self.G = index.G
        self._tp = mesh.shape["tp"]
        self._dp = mesh.shape["dp"]
        mat = index._stored()  # empty slots already mapped to non-matching
        pad_g = -self.G % self._tp
        if pad_g:
            # Padding rows of -2 can never match a fingerprint (valid range
            # [-1, 2^W)); they are sliced off the count output anyway.
            mat = np.vstack([mat, np.full((pad_g, mat.shape[1]), -2,
                                          np.int32)])
        self._mat = jax.device_put(
            mat, NamedSharding(mesh, P("tp", None)))
        self._count = sharded_count(mesh)

    def counts(self, q_sketches: np.ndarray) -> np.ndarray:
        """(Q, G) hit counts; Q is padded to a 'dp' multiple internally."""
        q = np.atleast_2d(np.asarray(q_sketches, np.int32))
        q = np.where((q < 0) | (q >= self.params.fingerprint_range), -3, q)
        Q = len(q)
        pad_q = -Q % self._dp
        if pad_q:
            q = np.vstack([q, np.full((pad_q, q.shape[1]), -2, np.int32)])
        qd = jax.device_put(q, NamedSharding(self.mesh, P("dp", None)))
        out = self._count(qd, self._mat)
        return np.asarray(out)[:Q, :self.G]

    def hits(self, q_sketch: np.ndarray):
        from ..index import hits_from_counts
        return hits_from_counts(self.counts(q_sketch[None, :])[0],
                                self.params.min_score)
