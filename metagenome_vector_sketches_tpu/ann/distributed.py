"""Distributed flat-IP index: database rows sharded over a device mesh,
queries replicated, per-device fused dot+top-k merged with an all-gather +
re-top-k (parallel.pairwise.distributed_topk). Drop-in for FlatIPIndex.search
at pod scale."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..parallel.mesh import make_mesh, row_sharding, replicated
from ..parallel.pairwise import distributed_topk
from .flat_index import FlatIPIndex


class DistributedFlatIPIndex:
    def __init__(self, vectors: np.ndarray, mesh=None):
        """vectors: (n, d) float32 L2-normalized. Rows are padded to a
        multiple of the mesh size (pad rows are zero => never in top-k unless
        k exceeds the true matches, mirroring FAISS's -1 semantics is handled
        by score masking)."""
        self.mesh = mesh if mesh is not None else make_mesh()
        n_dev = self.mesh.devices.size
        n, d = vectors.shape
        self.ntotal = n
        npad = ((n + n_dev - 1) // n_dev) * n_dev
        padded = np.zeros((npad, d), dtype=np.float32)
        padded[:n] = vectors
        self.v = jax.device_put(jnp.asarray(padded), row_sharding(self.mesh))

    @classmethod
    def from_flat(cls, index: FlatIPIndex, mesh=None):
        return cls(index.vectors, mesh=mesh)

    def search(self, queries: np.ndarray, k: int):
        q = jax.device_put(
            jnp.asarray(np.ascontiguousarray(queries, dtype=np.float32)),
            replicated(self.mesh))
        # n_valid masks the mesh-padding rows to -inf inside the kernel so
        # they cannot displace genuine negative-inner-product neighbors
        D, I = distributed_topk(self.mesh, q, self.v, k,
                                n_valid=self.ntotal)
        D, I = np.array(D), np.array(I)
        bad = ~np.isfinite(D) | (I >= self.ntotal)
        D[bad] = 0.0
        I[bad] = -1
        return D, I
