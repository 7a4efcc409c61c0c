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


def sweep_counts_impl(limbs, thr, tile_coords, tile: int):
    """Survivor counts for a batch of (row_tile, col_tile) coordinate pairs,
    as ONE jitted lax.scan — the whole-sweep hot loop. Nothing bigger than a
    per-tile scalar leaves the fused matmul+threshold epilogue, so this runs
    at MXU speed-of-light (~85% of int8 peak on v5e), and one dispatch covers
    thousands of tiles (dispatch/D2H latency amortized — essential both for
    production hosts and high-latency device tunnels).

    Args:
      limbs: (L, Npad, d) int8 — the whole (padded) database, device-resident.
        Padding rows must have thr = +inf so they never pass.
      thr:   (Npad,) float32 squared norms.
      tile_coords: (T, 2) int32 — (row_tile_index, col_tile_index) pairs.
      tile: static tile edge (Npad % tile == 0).

    Returns: (T,) int32 survivor counts per tile.
    """
    L, Npad, d = limbs.shape

    def tile_fn(carry, rc):
        r, c = rc[0], rc[1]
        vi = jax.lax.dynamic_slice(limbs, (0, r * tile, 0), (L, tile, d))
        vj = jax.lax.dynamic_slice(limbs, (0, c * tile, 0), (L, tile, d))
        thr_i = jax.lax.dynamic_slice(thr, (r * tile,), (tile,))
        thr_j = jax.lax.dynamic_slice(thr, (c * tile,), (tile,))
        approx = jnp.zeros((tile, tile), jnp.float32)
        for a in range(L):
            for b in range(L):
                p = jax.lax.dot_general(
                    vi[a], vj[b],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                approx = approx + p.astype(jnp.float32) * np.float32(2.0 ** (7 * (a + b)))
        passes = approx / np.float32(d) > \
            0.05 * (thr_i[:, None] + thr_j[None, :]) * np.float32(1.0 - 1e-5) - np.float32(4.0)
        return carry, jnp.sum(passes.astype(jnp.int32))

    _, counts = jax.lax.scan(tile_fn, None, tile_coords)
    return counts


sweep_counts = jax.jit(sweep_counts_impl, static_argnames=("tile",))


@functools.partial(jax.jit, static_argnames=("tile", "cap"))
def tile_extract(limbs, thr, r, c, tile: int, cap: int):
    """Candidate extraction for ONE hot tile out of the device-resident
    database: recompute its mask and compact coordinates (row-major order).
    Returns (idx (cap,) int32 with -1 padding, count)."""
    L, Npad, d = limbs.shape
    vi = jax.lax.dynamic_slice(limbs, (0, r * tile, 0), (L, tile, d))
    vj = jax.lax.dynamic_slice(limbs, (0, c * tile, 0), (L, tile, d))
    thr_i = jax.lax.dynamic_slice(thr, (r * tile,), (tile,))
    thr_j = jax.lax.dynamic_slice(thr, (c * tile,), (tile,))
    approx = jnp.zeros((tile, tile), jnp.float32)
    for a in range(L):
        for b in range(L):
            p = jax.lax.dot_general(
                vi[a], vj[b],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            approx = approx + p.astype(jnp.float32) * np.float32(2.0 ** (7 * (a + b)))
    passes = approx / np.float32(d) > \
        0.05 * (thr_i[:, None] + thr_j[None, :]) * np.float32(1.0 - 1e-5) - np.float32(4.0)
    flat = passes.reshape(-1)
    count = jnp.sum(flat.astype(jnp.int32))
    idx = jnp.nonzero(flat, size=cap, fill_value=-1)[0].astype(jnp.int32)
    return idx, count


@functools.partial(jax.jit, static_argnames=("tile", "cap"))
def extract_batch(limbs, thr, coords, tile: int, cap: int):
    """Candidate extraction + exact partial dots for a BATCH of hot tiles in
    one program (lax.scan over tiles): one dispatch and one host read replace
    per-tile calls. Tiles should be bucketed so cap ~ their true counts.

    Args:
      limbs: (L, Npad, d) int8 device-resident database; thr (Npad,) f32.
      coords: (K, 2) int32 (row_tile, col_tile) pairs.
      cap: static per-tile candidate capacity.

    Returns (idx (K, cap) int32 flattened in-tile coords (-1 pad),
             counts (K,) int32, pab (K, cap, L*L) int32 exact partial dots).
    """
    L, npad, d = limbs.shape

    def one(carry, rc):
        r, c = rc[0], rc[1]
        vi = jax.lax.dynamic_slice(limbs, (0, r * tile, 0), (L, tile, d))
        vj = jax.lax.dynamic_slice(limbs, (0, c * tile, 0), (L, tile, d))
        thr_i = jax.lax.dynamic_slice(thr, (r * tile,), (tile,))
        thr_j = jax.lax.dynamic_slice(thr, (c * tile,), (tile,))
        approx = jnp.zeros((tile, tile), jnp.float32)
        for a in range(L):
            for b in range(L):
                p = jax.lax.dot_general(
                    vi[a], vj[b],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                approx = approx + p.astype(jnp.float32) * np.float32(2.0 ** (7 * (a + b)))
        passes = approx / np.float32(d) > \
            0.05 * (thr_i[:, None] + thr_j[None, :]) * np.float32(1.0 - 1e-5) - np.float32(4.0)
        flat = passes.reshape(-1)
        count = jnp.sum(flat.astype(jnp.int32))
        idx = jnp.nonzero(flat, size=cap, fill_value=-1)[0].astype(jnp.int32)
        safe = jnp.maximum(idx, 0)
        gi = jnp.take(vi, safe // tile, axis=1)
        gj = jnp.take(vj, safe % tile, axis=1)
        pab = []
        for a in range(L):
            for b in range(L):
                pab.append(jnp.sum(gi[a].astype(jnp.int32) * gj[b].astype(jnp.int32),
                                   axis=-1))
        return carry, (idx, count, jnp.stack(pab, axis=-1))

    _, (idx, counts, pab) = jax.lax.scan(one, None, coords)
    return idx, counts, pab


@functools.partial(jax.jit, static_argnames=("tile",))
def tile_exact_pab(limbs, r, c, idx, tile: int):
    """Exact (K, L*L) int32 partial limb dots for flattened coords of one
    tile of the device-resident database."""
    L, Npad, d = limbs.shape
    vi = jax.lax.dynamic_slice(limbs, (0, r * tile, 0), (L, tile, d))
    vj = jax.lax.dynamic_slice(limbs, (0, c * tile, 0), (L, tile, d))
    return exact_pab_at(vi, vj, idx, tile)


@functools.partial(jax.jit, static_argnames=("cap",))
def tile_scan(vi_limbs, vj_limbs, thr_i, thr_j, cap: int):
    """Phase-1-only sweep: fused limb matmuls + threshold -> compacted
    candidate coords. This is the speed-of-light hot loop (the L^2 int32
    partial tiles never leave the MXU epilogue); exact partial dots for the
    (sparse) candidates are computed separately with :func:`exact_pab_at`
    sized to the true count.

    Returns (idx (cap,) int32 row-major flattened coords with -1 padding,
    count () int32 true number of passes — retry with bigger cap if > cap).
    """
    L, Ti, d = vi_limbs.shape
    Tj = vj_limbs.shape[1]
    approx = jnp.zeros((Ti, Tj), jnp.float32)
    for a in range(L):
        for b in range(L):
            p = jax.lax.dot_general(
                vi_limbs[a], vj_limbs[b],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            approx = approx + p.astype(jnp.float32) * np.float32(2.0 ** (7 * (a + b)))
    thr = 0.05 * (thr_i[:, None] + thr_j[None, :])
    passes = approx / np.float32(d) > thr * np.float32(1.0 - 1e-5) - np.float32(4.0)
    flat = passes.reshape(-1)
    count = jnp.sum(flat.astype(jnp.int32))
    idx = jnp.nonzero(flat, size=cap, fill_value=-1)[0].astype(jnp.int32)
    return idx, count


@functools.partial(jax.jit, static_argnames=("cap",))
def tile_candidates(vi_limbs, vj_limbs, thr_i, thr_j, cap: int):
    """One (Ti x Tj) tile of the thresholded pairwise sweep.

    Two fused phases:
    1. The MXU sweep — int8 limb matmuls whose float32 limb-combine and
       threshold test fuse into the matmul epilogue, so the L^2 int32 partial
       tiles never hit HBM (this is the speed-of-light path: only the
       boolean mask is materialized).
    2. Exact partial dots are recomputed ONLY for the compacted candidates by
       gathering their rows: K*d VPU work, negligible next to the sweep.

    Args:
      vi_limbs: (L, Ti, d) int8;  vj_limbs: (L, Tj, d) int8.
      thr_i, thr_j: (Ti,)/(Tj,) float32 — squared norms (the |set| estimates).
      cap: static candidate capacity for this tile.

    Returns:
      idx:   (cap,) int32 — flattened ti*Tj+tj candidate coords, -1 padding,
             in row-major (ascending ti, then tj) order.
      pab:   (cap, L*L) int32 — exact partial limb dots for int64 host
             recombination.
      count: () int32 — true number of threshold passes (may exceed cap;
             caller must retry with a bigger cap if count > cap).
    """
    L, Ti, d = vi_limbs.shape
    Tj = vj_limbs.shape[1]
    # phase 1: fused sweep -> boolean mask only
    approx = jnp.zeros((Ti, Tj), jnp.float32)
    for a in range(L):
        for b in range(L):
            p = jax.lax.dot_general(
                vi_limbs[a], vj_limbs[b],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            approx = approx + p.astype(jnp.float32) * np.float32(2.0 ** (7 * (a + b)))
    thr = 0.05 * (thr_i[:, None] + thr_j[None, :])
    # Conservative slack: float32 rounding of approx and thr is bounded well
    # under (relative 1e-5 + absolute 4) for the magnitudes involved; the
    # exact float64/integer re-filter on host removes false positives.
    passes = approx / np.float32(d) > thr * np.float32(1.0 - 1e-5) - np.float32(4.0)
    flat = passes.reshape(-1)
    count = jnp.sum(flat.astype(jnp.int32))
    idx = jnp.nonzero(flat, size=cap, fill_value=-1)[0].astype(jnp.int32)

    # phase 2: exact partial dots for the candidates via row gathers
    pab = exact_pab_at(vi_limbs, vj_limbs, idx, Tj)
    return idx, pab, count


@functools.partial(jax.jit, static_argnames=("Tj",))
def exact_pab_at(vi_limbs, vj_limbs, idx, Tj: int):
    """Exact (K, L*L) int32 partial limb dots for flattened tile coords
    `idx` (-1 entries are computed at a safe slot and discarded by the
    caller). K*d VPU work — size this to the true candidate count, not the
    tile, by slicing idx before calling."""
    L = vi_limbs.shape[0]
    safe = jnp.maximum(idx, 0)
    rows = safe // Tj
    cols = safe % Tj
    gi = vi_limbs[:, rows, :]        # (L, K, d) int8
    gj = vj_limbs[:, cols, :]
    pab = []
    for a in range(L):
        for b in range(L):
            prod = gi[a].astype(jnp.int32) * gj[b].astype(jnp.int32)
            pab.append(jnp.sum(prod, axis=-1))
    return jnp.stack(pab, axis=-1)    # (K, L*L) int32, exact


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
