"""Pairwise similarity kernels: exact integer dot products at MXU speed.

The reference's flagship compute is a blocked int32 GEMM with a sparsity
threshold (pairwise_comp_optimized.cpp:57-160). TPUs do integer matmuls
natively only at int8 on the MXU, so we decompose each int32 component into
base-128 limbs:

    v = sum_k limb_k * 2^(7k),   limb_k in [0,127] for k < L-1,
                                 limb_{L-1} = v >> 7(L-1) in [-128,127]

so the exact dot is  dot(x, y) = sum_{a,b} 2^{7(a+b)} * dot(limb_a(x), limb_b(y))
with every partial dot an int8 x int8 -> int32 MXU matmul (exact: each partial
is bounded by d * 128^2 << 2^31).

On device we also build a float32 approximation of the combined dot and apply
the reference's retention threshold with conservative slack, compact the
candidate coordinates with a fixed-capacity nonzero, and gather the partial
dots. The exact (int64) recombination, the exact threshold (integer division
semantics for the int32 path, float division for the int16 path —
pairwise_comp_optimized.cpp:139-141 vs pairwise_comp_optimized_16bits.cpp:218)
and the Jaccard quantization all happen on host in float64, bit-equal to the
reference math.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def _limbs_ok(max_abs: int, L: int) -> bool:
    # top limb is signed: v >> 7(L-1) must land in [-128, 127]
    return (-128 <= (-max_abs) >> (7 * (L - 1))) and ((max_abs >> (7 * (L - 1))) <= 127)


def pick_limbs(max_abs: int) -> int:
    L = 1
    while not _limbs_ok(max_abs, L):
        L += 1
    return L


@functools.partial(jax.jit, static_argnames=("L",))
def decompose_limbs(v, L: int):
    """(n, d) int32 -> (L, n, d) int8 base-128 limbs (top limb signed)."""
    v = v.astype(jnp.int32)
    limbs = []
    cur = v
    for _ in range(L - 1):
        limbs.append((cur & 127).astype(jnp.int8))
        cur = cur >> 7  # arithmetic shift
    limbs.append(cur.astype(jnp.int8))
    return jnp.stack(limbs)


@functools.partial(jax.jit, static_argnames=("cap",))
def tile_candidates(vi_limbs, vj_limbs, thr_i, thr_j, cap: int):
    """One (Ti x Tj) tile of the thresholded pairwise sweep.

    Args:
      vi_limbs: (L, Ti, d) int8;  vj_limbs: (L, Tj, d) int8.
      thr_i, thr_j: (Ti,)/(Tj,) float32 — squared norms (the |set| estimates).
      cap: static candidate capacity for this tile.

    Returns:
      idx:   (cap,) int32 — flattened ti*Tj+tj candidate coords, -1 padding,
             in row-major (ascending ti, then tj) order.
      pab:   (cap, L*L) int32 — partial limb dots for exact host recombination.
      count: () int32 — true number of threshold passes (may exceed cap;
             caller must retry with a bigger cap if count > cap).
    """
    L, Ti, d = vi_limbs.shape
    Tj = vj_limbs.shape[1]
    parts = []
    for a in range(L):
        for b in range(L):
            p = jax.lax.dot_general(
                vi_limbs[a], vj_limbs[b],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            parts.append(p)
    # float32 approximation of the exact dot for the threshold pre-filter
    approx = jnp.zeros((Ti, Tj), jnp.float32)
    k = 0
    for a in range(L):
        for b in range(L):
            approx = approx + parts[k].astype(jnp.float32) * np.float32(2.0 ** (7 * (a + b)))
            k += 1
    thr = 0.05 * (thr_i[:, None] + thr_j[None, :])
    # Conservative slack: float32 rounding of approx and thr is bounded well
    # under (relative 1e-5 + absolute 4) for the magnitudes involved; the
    # exact float64/integer re-filter on host removes false positives.
    passes = approx / np.float32(d) > thr * np.float32(1.0 - 1e-5) - np.float32(4.0)
    flat = passes.reshape(-1)
    count = jnp.sum(flat.astype(jnp.int32))
    idx = jnp.nonzero(flat, size=cap, fill_value=-1)[0].astype(jnp.int32)
    safe = jnp.maximum(idx, 0)
    pab = jnp.stack([p.reshape(-1)[safe] for p in parts], axis=-1)
    return idx, pab, count


def recombine_exact(pab: np.ndarray, L: int) -> np.ndarray:
    """(n, L*L) int32 partial dots -> (n,) exact int64 dots."""
    weights = np.array([1 << (7 * (a + b)) for a in range(L) for b in range(L)],
                       dtype=np.int64)
    return pab.astype(np.int64) @ weights


def exact_filter_int32(dots: np.ndarray, thr: np.ndarray, d: int) -> np.ndarray:
    """Reference int32 retention: (dot / d) > 0.05*(ni+nj) with C++ int64
    truncating division (pairwise_comp_optimized.cpp:139-141)."""
    q = np.where(dots >= 0, dots // d, -((-dots) // d))
    return q.astype(np.float64) > thr


def exact_filter_int16(dots: np.ndarray, thr: np.ndarray, d: int) -> np.ndarray:
    """Reference int16 retention: double division
    (pairwise_comp_optimized_16bits.cpp:211-218)."""
    return dots.astype(np.float64) / d > thr
