"""The pairwise compute engine: all-vs-all thresholded similarity on TPU.

Drives ops.pairwise tile kernels over the shard's row range x all columns
(the reference's chunked loop, pairwise_comp_optimized.cpp:949-982), with:

- int8 limb decomposition once per vector chunk, kept on device (HBM),
- MXU int8 matmuls + on-device threshold pre-filter + candidate compaction,
- exact float64/int64 host finalization (both the int32 integer-division and
  the int16 float-division retention semantics, SURVEY.md §2.4),
- shard-folder output via matrix.writer (the active jaccard format).

The shard loop (--num_shards/--shard_idx) is preserved as the unit of
checkpointing/restart, exactly like the reference's HPC job-array contract.
"""

from __future__ import annotations

import os
import time

import numpy as np
import jax.numpy as jnp

from ..io.dbfolder import DbFolder
from ..ops import pairwise as pw
from ..utils.log import log
from . import writer


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


class _LimbCache:
    """Device-resident int8 limb blocks keyed by column-chunk, bounded."""

    def __init__(self, db: DbFolder, L: int, budget_bytes: int = 4 << 30):
        self.db = db
        self.L = L
        self.budget = budget_bytes
        self.cache: dict[tuple[int, int], object] = {}
        self.bytes = 0

    def get(self, start: int, end: int):
        key = (start, end)
        if key not in self.cache:
            block = self.db.load_vectors(start, end).astype(np.int32)
            limbs = pw.decompose_limbs(jnp.asarray(block), self.L)
            size = limbs.size
            if self.bytes + size > self.budget and self.cache:
                self.cache.clear()
                self.bytes = 0
            self.cache[key] = limbs
            self.bytes += size
        return self.cache[key]


def scan_max_abs(db: DbFolder, chunk: int = 8192) -> int:
    """One streaming pass over vectors.bin for the global max |component|
    (fixes the limb count statically for the whole run)."""
    n = db.total_vectors_from_bin()
    m = 0
    for s in range(0, n, chunk):
        block = db.load_vectors(s, min(s + chunk, n))
        if block.size:
            m = max(m, int(np.max(np.abs(block.astype(np.int64)))))
    return m


def compute_pairwise_shard(db_folder: str, output_folder: str,
                           num_shards: int = 1, shard_idx: int = 0,
                           tile_rows: int = 1024, tile_cols: int = 1024,
                           verbose: bool = True) -> str:
    """Compute one shard of the all-vs-all matrix and write its folder.

    Returns the shard folder path.
    """
    db = DbFolder(db_folder)
    d = db.dimension
    dtype = db.dtype
    _, norms = db.names_and_norms()
    norms_sq = norms * norms  # float64, text round-tripped — reference :900

    total = db.total_vectors_from_bin()
    rows_per_shard = (total + num_shards - 1) // num_shards
    begin_row = shard_idx * rows_per_shard
    end_row = min(begin_row + rows_per_shard, total)
    if verbose:
        log(f"Shard {shard_idx} processing rows {begin_row} to {end_row} "
            f"of {total} (d={d}, dtype={dtype})")

    max_abs = scan_max_abs(db)
    L = pw.pick_limbs(max(1, max_abs))
    exact_filter = pw.exact_filter_int16 if dtype == "int16" else pw.exact_filter_int32

    cache = _LimbCache(db, L)
    thr_f32 = norms_sq.astype(np.float32)

    rows_out, cols_out, vals_out = [], [], []
    t0 = time.perf_counter()
    for bi in range(begin_row, end_row, tile_rows):
        ei = min(bi + tile_rows, end_row)
        vi = cache.get(bi, ei)
        ti = ei - bi
        for bj in range(0, total, tile_cols):
            ej = min(bj + tile_cols, total)
            vj = cache.get(bj, ej)
            tj = ej - bj
            cap = max(1024, (ti * tj) // 64)
            while True:
                idx, pab, count = pw.tile_candidates(
                    vi, vj, jnp.asarray(thr_f32[bi:ei]), jnp.asarray(thr_f32[bj:ej]),
                    cap=cap)
                count = int(count)
                if count <= cap:
                    break
                cap = _next_pow2(count)
            if count == 0:
                continue
            idx = np.asarray(idx[:count])
            pab = np.asarray(pab[:count])
            r = bi + idx // tj
            c = bj + idx % tj
            dots = pw.recombine_exact(pab, L)
            thr = 0.05 * (norms_sq[r] + norms_sq[c])
            keep = exact_filter(dots, thr, d)
            rows_out.append(r[keep])
            cols_out.append(c[keep])
            vals_out.append(dots[keep])

    if rows_out:
        rows = np.concatenate(rows_out)
        cols = np.concatenate(cols_out)
        vals = np.concatenate(vals_out)
    else:
        rows = cols = vals = np.empty(0, dtype=np.int64)
    if verbose:
        dt = (time.perf_counter() - t0) * 1000
        log(f"Total computation time: {dt:.0f} ms ({len(rows)} surviving pairs)")

    shard_folder = os.path.join(output_folder, f"shard_{shard_idx}")
    writer.write_shard(shard_folder, rows, cols, vals, norms_sq, d)
    return shard_folder


def compute_pairwise_oracle(vectors: np.ndarray, norms_sq: np.ndarray,
                            dimension: int, dtype: str = "int32",
                            row_range: tuple[int, int] | None = None):
    """Brute-force float64/int64 numpy oracle of the reference semantics —
    used by the conformance tests (the reference pairwise binary cannot be
    built: its `bits` submodule is unpinned/empty)."""
    n = vectors.shape[0]
    lo, hi = row_range if row_range else (0, n)
    v = vectors.astype(np.int64)
    rows, cols, vals = [], [], []
    for i in range(lo, hi):
        dots = v[i] @ v.T  # exact int64
        thr = 0.05 * (norms_sq[i] + norms_sq)
        if dtype == "int16":
            keep = dots.astype(np.float64) / dimension > thr
        else:
            q = np.where(dots >= 0, dots // dimension, -((-dots) // dimension))
            keep = q.astype(np.float64) > thr
        j = np.flatnonzero(keep)
        rows.append(np.full(len(j), i, dtype=np.int64))
        cols.append(j.astype(np.int64))
        vals.append(dots[j])
    return (np.concatenate(rows), np.concatenate(cols), np.concatenate(vals))
