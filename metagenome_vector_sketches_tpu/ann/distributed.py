"""Distributed ANN indexes over a device mesh.

DistributedFlatIPIndex: database rows sharded, queries replicated,
per-device fused dot+top-k merged with an all-gather + re-top-k
(parallel.pairwise.distributed_topk). Drop-in for FlatIPIndex.search at
pod scale.

DistributedIntExactIndex: the int8-plane exact engine's chunk stack
sharded on the chunk axis; each device scans its local chunks with
globalized indices, then the per-device candidate pools (scores, indices
AND exact plane partials) merge over ICI with one all-gather + re-top-k —
the host finalize (exact int64 dots, float64 cosine ranking) is unchanged
from the single-chip engine."""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..parallel.mesh import make_mesh, row_sharding, replicated, DATA_AXIS
from ..parallel.pairwise import distributed_topk
from .flat_index import FlatIPIndex
from .int_index import IntExactIndex, _int_scan_pool


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


@functools.lru_cache(maxsize=None)
def _int_pool_fn(mesh, pool: int, rt: float, n_total: int):
    """Mesh-sharded candidate pooling for the int8-plane engine: local
    scan over this device's chunk shard (global indices via axis_index),
    then ONE all-gather of the (score, index, partials) pools + re-top-k.
    Per-query ICI traffic is pool * (8 + 4P) bytes — independent of N."""

    def step(qp, stack_local, inv_local):
        C_l, _, R, _ = stack_local.shape
        base0 = jax.lax.axis_index(DATA_AXIS) * (C_l * R)
        s, i, p = _int_scan_pool.__wrapped__(
            qp, stack_local, inv_local, n_total, pool,
            recall_target=rt, base0=base0)
        s_all = jax.lax.all_gather(s, DATA_AXIS, axis=1, tiled=True)
        i_all = jax.lax.all_gather(i, DATA_AXIS, axis=1, tiled=True)
        p_all = jax.lax.all_gather(p, DATA_AXIS, axis=2, tiled=True)
        # the merged pool may exceed a device's local C_l*R cap — re-top-k
        # at the full requested pool so tiny shards still fill it
        ns, sel = jax.lax.top_k(s_all, min(pool, s_all.shape[1]))
        ni = jnp.take_along_axis(i_all, sel, axis=1)
        nP = jnp.take_along_axis(p_all, sel[None], axis=2)
        return ns, ni, nP

    fn = shard_map(step, mesh=mesh,
                   in_specs=(P(), P(DATA_AXIS, None, None, None),
                             P(DATA_AXIS, None)),
                   out_specs=(P(), P(), P()),
                   check_vma=False)  # identical on all devices post-gather
    return jax.jit(fn)


class DistributedIntExactIndex(IntExactIndex):
    """IntExactIndex with its chunk stack sharded over a mesh: same search
    contract (float64-exact cosines), candidate pooling fanned out over
    the devices. Build the base index first (any construction path), then
    wrap: ``DistributedIntExactIndex.from_index(idx, mesh)``."""

    def __init__(self, *a, **kw):
        raise TypeError("use DistributedIntExactIndex.from_index(...)")

    @classmethod
    def from_index(cls, index: IntExactIndex,
                   mesh=None) -> "DistributedIntExactIndex":
        mesh = mesh if mesh is not None else make_mesh()
        n_dev = mesh.devices.size
        C, Pn, R, d = index._stack.shape
        Cpad = ((C + n_dev - 1) // n_dev) * n_dev
        stack, inv = index._stack, index._inv_n
        if Cpad != C:
            # pad chunks sit past ntotal => masked inside the scan
            stack = jnp.concatenate(
                [stack, jnp.zeros((Cpad - C, Pn, R, d), jnp.int8)])
            inv = jnp.concatenate(
                [inv, jnp.zeros((Cpad - C, R), jnp.float32)])
        self = cls.__new__(cls)
        self._shape = index._shape
        self.chunk_rows = index.chunk_rows
        self.mode = index.mode
        self.recall_target = index.recall_target
        self.pool_margin = index.pool_margin
        self.max_abs = index.max_abs
        self.L = index.L
        self.ns = index.ns
        self.mesh = mesh
        self._stack = jax.device_put(
            stack, NamedSharding(mesh, P(DATA_AXIS, None, None, None)))
        self._inv_n = jax.device_put(
            inv, NamedSharding(mesh, P(DATA_AXIS, None)))
        return self

    def _pool(self, qp, pool: int, rt: float):
        qp = jax.device_put(qp, replicated(self.mesh))
        return _int_pool_fn(self.mesh, pool, rt, self.ntotal)(
            qp, self._stack, self._inv_n)
