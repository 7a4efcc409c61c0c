"""MinHash strategy: EXACT pairwise intersections from the raw FracMinHash
sets (the reference's historical "--strategy 1", kept as a secondary
estimator — README.md:73 documents it, the accuracy study models it
(compute_error_of_random_projections.py:160-180), and BASELINE.json lists it
as a benchmark config; no projection error involved).

TPU formulation: the all-vs-all intersection-count matrix is
M @ M^T where M is the (N x U) binary incidence matrix of accessions over the
unique-hash universe. U is processed in chunks of dense int8 columns so every
step is an MXU int8 matmul with int32 accumulation — exact, and at matmul
speed-of-light like the sketch path.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def build_universe(hash_sets) -> tuple[np.ndarray, list[np.ndarray]]:
    """-> (sorted unique hash universe, per-set positions into it)."""
    universe = np.unique(np.concatenate([np.asarray(s, dtype=np.uint64)
                                         for s in hash_sets if len(s)]))
    positions = [np.searchsorted(universe, np.asarray(s, dtype=np.uint64))
                 for s in hash_sets]
    return universe, positions


@jax.jit
def _chunk_gram(m_chunk):
    """(N, u) int8 incidence chunk -> (N, N) int32 partial intersections."""
    return jax.lax.dot_general(m_chunk, m_chunk,
                               dimension_numbers=(((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.int32)


def pairwise_intersections(hash_sets, chunk: int = 1 << 14) -> np.ndarray:
    """Exact (N, N) int64 intersection-count matrix via chunked incidence
    matmuls on the accelerator."""
    n = len(hash_sets)
    universe, positions = build_universe(hash_sets)
    U = len(universe)
    out = np.zeros((n, n), dtype=np.int64)
    if U == 0:
        return out
    # pad the chunk width to a lane multiple once
    for s in range(0, U, chunk):
        e = min(s + chunk, U)
        width = e - s
        m = np.zeros((n, chunk), dtype=np.int8)
        for i, pos in enumerate(positions):
            sel = pos[(pos >= s) & (pos < e)] - s
            m[i, sel] = 1
        out += np.asarray(_chunk_gram(jnp.asarray(m)), dtype=np.int64)
        del m
    return out


def pairwise_jaccard_minhash(hash_sets) -> tuple[np.ndarray, np.ndarray]:
    """-> (jaccard (N,N) float64, sizes (N,)) — exact set Jaccard:
    J = |A&B| / (|A| + |B| - |A&B|)."""
    inter = pairwise_intersections(hash_sets)
    sizes = np.array([len(np.unique(np.asarray(s, dtype=np.uint64)))
                      for s in hash_sets], dtype=np.int64)
    union = sizes[:, None] + sizes[None, :] - inter
    with np.errstate(invalid="ignore", divide="ignore"):
        jac = np.where(union > 0, inter / union, 0.0)
    return jac, sizes


def minhash_triples(hash_sets):
    """Surviving (row, col, value) triples under the reference retention rule
    expressed on the true sets: keep iff intersection > 0.05*(|A|+|B|)
    (equivalently J > 0.05/1.05; matches the sketch path's rule with the
    exact quantities in place of the estimates). `value` is the raw
    intersection count, analogous to dot/d of the sketch path."""
    inter = pairwise_intersections(hash_sets)
    sizes = np.array([len(np.unique(np.asarray(s, dtype=np.uint64)))
                      for s in hash_sets], dtype=np.int64)
    thr = 0.05 * (sizes[:, None] + sizes[None, :])
    keep = inter.astype(np.float64) > thr
    r, c = np.nonzero(keep)
    return r.astype(np.int64), c.astype(np.int64), inter[r, c], sizes
