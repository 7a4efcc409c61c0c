"""The pairwise compute engine: all-vs-all thresholded similarity on TPU.

Replaces the reference's chunked CPU loop (pairwise_comp_optimized.cpp:949-982)
with a two-phase device-resident sweep:

1. **Counts sweep** — the whole shard-row x all-columns tile grid runs as ONE
   jitted lax.scan (ops.pairwise.sweep_counts): int8 limb matmuls whose
   float32 combine + retention threshold fuse into the MXU epilogue; only a
   per-tile scalar count leaves the chip (~85% of int8 peak on v5e).
2. **Hot-tile extraction** — only tiles with survivors (sparse in practice)
   get a second pass: mask compaction sized to the true count, then exact
   int32 partial limb dots for the candidates.

Exact finalization happens on host in float64/int64, reproducing both the
int32 integer-division and the int16 float-division retention semantics
(SURVEY.md §2.4), then the shard folder is written in the active format.

The --num_shards/--shard_idx job-array contract is preserved as the unit of
checkpointing/restart. A streaming fallback covers databases whose limb
decomposition exceeds the device memory budget.
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


def _finalize(idx_np, dots, r_tile, c_tile, tile, d, norms_sq,
              exact_filter, row_lo, row_hi, n_total):
    """Exact host finalization of one tile's candidates -> (rows, cols, dots).
    `dots` are the exact int64 dot products (device-recombined)."""
    r = r_tile * tile + idx_np // tile
    c = c_tile * tile + idx_np % tile
    keep_range = (r >= row_lo) & (r < row_hi) & (c < n_total)
    r, c, dots = r[keep_range], c[keep_range], dots[keep_range]
    if len(r) == 0:
        return None
    thr = 0.05 * (norms_sq[r] + norms_sq[c])
    keep = exact_filter(dots, thr, d)
    return r[keep], c[keep], dots[keep]


def shard_is_complete(output_folder: str, shard_idx: int) -> bool:
    """A shard is complete when its neighbor_start.bin exists (written last
    by the writer) — the unit of checkpoint/restart, like the reference's
    re-run-the-failed-shard recovery model (SURVEY.md §5)."""
    return os.path.exists(os.path.join(output_folder, f"shard_{shard_idx}",
                                       "neighbor_start.bin"))


def compute_pairwise_shard(db_folder: str, output_folder: str,
                           num_shards: int = 1, shard_idx: int = 0,
                           tile_rows: int = 1024, tile_cols: int = 1024,
                           device_budget_bytes: int = 8 << 30,
                           resume: bool = False,
                           verbose: bool = True) -> str:
    """Compute one shard of the all-vs-all matrix and write its folder.

    Returns the shard folder path. tile_rows is the tile edge of the
    device-resident path (tile_cols kept for the streaming fallback's API).
    With resume=True, an already-complete shard folder is left untouched.
    """
    if resume and shard_is_complete(output_folder, shard_idx):
        if verbose:
            log(f"Shard {shard_idx} already complete, skipping (resume)")
        return os.path.join(output_folder, f"shard_{shard_idx}")
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

    t0 = time.perf_counter()
    tile = tile_rows
    npad = ((total + tile - 1) // tile) * tile
    plane_bytes = pw.num_planes(L) * npad * d
    if plane_bytes <= device_budget_bytes:
        rows, cols, vals = _compute_device_resident(
            db, norms_sq, total, begin_row, end_row, tile, L, d,
            exact_filter, verbose)
    else:
        rows, cols, vals = _compute_streaming(
            db, norms_sq, total, begin_row, end_row, tile_rows, tile_cols,
            L, d, exact_filter, device_budget_bytes)

    if verbose:
        dt = (time.perf_counter() - t0) * 1000
        log(f"Total computation time: {dt:.0f} ms ({len(rows)} surviving pairs)")

    shard_folder = os.path.join(output_folder, f"shard_{shard_idx}")
    writer.write_shard(shard_folder, rows, cols, vals, norms_sq, d)
    return shard_folder


def _empty():
    e = np.empty(0, dtype=np.int64)
    return e, e.copy(), e.copy()


def _concat(parts):
    if not parts:
        return _empty()
    return (np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
            np.concatenate([p[2] for p in parts]))


def _compute_device_resident(db, norms_sq, total, begin_row, end_row, tile,
                             L, d, exact_filter, verbose):
    npad = ((total + tile - 1) // tile) * tile
    V = np.zeros((npad, d), dtype=np.int32)
    V[:total] = db.load_vectors().astype(np.int32)
    thr = np.full(npad, np.float32(1e30), dtype=np.float32)
    thr[:total] = norms_sq.astype(np.float32)
    planes = pw.decompose_planes(jnp.asarray(V), L)
    del V
    thr_j = jnp.asarray(thr)

    nt = npad // tile
    rt0, rt1 = begin_row // tile, (end_row - 1) // tile + 1
    coords = np.array([(r, c) for r in range(rt0, rt1) for c in range(nt)],
                      dtype=np.int32)
    counts = None
    PALLAS_BLOCK = 512  # fastest VMEM-safe sweep block on v5e at d=2048
    if tile % PALLAS_BLOCK == 0 and d % 128 == 0:
        # Pallas fast path (TPU): one kernel over the whole grid at the
        # speed-of-light block size, sub-block counts aggregated up to the
        # (coarser) extraction tile
        from ..ops import pallas_pairwise as pp
        if pp.available():
            try:
                m = tile // PALLAS_BLOCK
                c_sub = np.asarray(pp.pallas_sweep_counts(
                    planes, thr_j, row_t0=rt0 * m, row_t1=rt1 * m,
                    block=PALLAS_BLOCK))                  # (R*m, nt*m)
                counts = c_sub.reshape(rt1 - rt0, m, nt, m).sum(axis=(1, 3)) \
                    .reshape(-1)
            except Exception:
                counts = None  # e.g. VMEM overflow -> XLA path
    if counts is None:
        counts = np.asarray(pw.sweep_counts(planes, thr_j, jnp.asarray(coords), tile))
    hot = np.flatnonzero(counts > 0)
    if verbose:
        log(f"sweep: {len(coords)} tiles, {len(hot)} hot, "
            f"{int(counts.sum())} candidates")

    # bucket hot tiles by capacity so each batched extraction is sized to its
    # tiles' true counts; one program + one host read per bucket
    buckets: dict[int, list[int]] = {}
    for k in hot:
        buckets.setdefault(max(256, _next_pow2(int(counts[k]))), []).append(k)

    parts = []
    for cap, ks in buckets.items():
        bcoords = jnp.asarray(coords[ks])
        idx_b, counts_b, hi_b, lo_b = pw.extract_batch(planes, thr_j, bcoords,
                                                       tile, cap)
        idx_b = np.asarray(idx_b)
        counts_b = np.asarray(counts_b)
        dots_b = pw.join_dot64(np.asarray(hi_b), np.asarray(lo_b))
        for t, k in enumerate(ks):
            r, c = int(coords[k][0]), int(coords[k][1])
            n = int(counts_b[t])
            assert n == int(counts[k])
            out = _finalize(idx_b[t, :n], dots_b[t, :n],
                            r, c, tile, d, norms_sq, exact_filter,
                            begin_row, end_row, total)
            if out is not None:
                parts.append(out)
    return _concat(parts)


def _compute_streaming(db, norms_sq, total, begin_row, end_row, tile_rows,
                       tile_cols, L, d, exact_filter, budget):
    """Column-streaming fallback for databases too large for device residency:
    row/column limb chunks are uploaded on demand (bounded cache) and each
    tile runs scan+extract."""
    thr_f32 = norms_sq.astype(np.float32)
    cache: dict[tuple[int, int], object] = {}
    cache_bytes = [0]

    def get(start, end):
        key = (start, end)
        if key not in cache:
            block = db.load_vectors(start, end).astype(np.int32)
            planes = pw.decompose_planes(jnp.asarray(block), L)
            if cache_bytes[0] + planes.size > budget and cache:
                cache.clear()
                cache_bytes[0] = 0
            cache[key] = planes
            cache_bytes[0] += planes.size
        return cache[key]

    parts = []
    for bi in range(begin_row, end_row, tile_rows):
        ei = min(bi + tile_rows, end_row)
        vi = get(bi, ei)
        for bj in range(0, total, tile_cols):
            ej = min(bj + tile_cols, total)
            vj = get(bj, ej)
            tj = ej - bj
            cap = max(1024, ((ei - bi) * tj) // 64)
            while True:
                idx, count = pw.tile_scan(
                    vi, vj, jnp.asarray(thr_f32[bi:ei]),
                    jnp.asarray(thr_f32[bj:ej]), cap=cap)
                count = int(count)
                if count <= cap:
                    break
                cap = _next_pow2(count)
            if count == 0:
                continue
            bucket = max(256, _next_pow2(count))
            pab = pw.exact_pab_at(vi, vj, idx[:min(bucket, cap)], tj)
            idx_np = np.asarray(idx[:count])
            r = bi + idx_np // tj
            c = bj + idx_np % tj
            dots = pw.recombine_exact(np.asarray(pab[:count]), L)
            thr = 0.05 * (norms_sq[r] + norms_sq[c])
            keep = exact_filter(dots, thr, d)
            if keep.any():
                parts.append((r[keep], c[keep], dots[keep]))
    return _concat(parts)


def compute_minhash_shard(hashes_file: str, output_folder: str,
                          num_shards: int = 1, shard_idx: int = 0,
                          db_folder: str | None = None,
                          verbose: bool = True) -> str:
    """MinHash-strategy pairwise shard (the reference's historical
    --strategy 1): EXACT set Jaccard from the raw hash sets via TPU
    incidence matmuls (ops.minhash), written in the active matrix format.

    If db_folder is given, its vector_norms.txt order defines the indices;
    otherwise a minimal db folder 'minhash_db' is written next to the matrix
    (norm = sqrt(|set|), so norm^2 is the exact |A| — the same contract the
    sketch path's norms estimate), making the whole query stack work
    unchanged.
    """
    from ..io.hashes import parse_hashes_file
    from ..io.dbfolder import DbFolder
    from ..ops import minhash

    named = parse_hashes_file(hashes_file)
    names = [n for n, _ in named]
    sets_ = [h for _, h in named]
    if db_folder:
        order = DbFolder(db_folder).names_and_norms()[0]
        index = {n: i for i, n in enumerate(names)}
        sets_ = [sets_[index[n]] for n in order]
        names = order

    total = len(names)
    rows_per_shard = (total + num_shards - 1) // num_shards
    begin_row = shard_idx * rows_per_shard
    end_row = min(begin_row + rows_per_shard, total)
    if verbose:
        log(f"MinHash shard {shard_idx}: rows {begin_row} to {end_row} of {total}")

    t0 = time.perf_counter()
    r, c, inter, sizes = minhash.minhash_triples(sets_)
    keep = (r >= begin_row) & (r < end_row)
    r, c, inter = r[keep], c[keep], inter[keep]
    if verbose:
        log(f"Total computation time: {(time.perf_counter()-t0)*1000:.0f} ms "
            f"({len(r)} surviving pairs)")

    if not db_folder:
        mdb = os.path.join(output_folder, "minhash_db")
        os.makedirs(mdb, exist_ok=True)
        with open(os.path.join(mdb, "vector_norms.txt"), "w") as f:
            for n, s in zip(names, sizes):
                f.write(f"{n} {np.sqrt(float(s)):.6g}\n")
        with open(os.path.join(mdb, "dimension.txt"), "w") as f:
            f.write("1\n")
        with open(os.path.join(mdb, "dtype.txt"), "w") as f:
            f.write("minhash\n")

    shard_folder = os.path.join(output_folder, f"shard_{shard_idx}")
    # dimension=1 and norms_sq=|A| make the writer's J = inter/(|A|+|B|-inter)
    # the exact set Jaccard
    writer.write_shard(shard_folder, r, c, inter.astype(np.int64),
                       sizes.astype(np.float64), dimension=1)
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
