"""Legacy matrix formats (read + write), for completeness with the
reference's historical artifacts (SURVEY.md §2.5):

Format A ("prev", raw int32): per row, first column absolute then deltas,
followed by per-neighbor values round(dot/d), 8 bytes per neighbor total;
row_index.txt lines "<row> <byte offset>"
(reference writer write_sparse_results_prev pairwise_comp_optimized.cpp:193-254,
readers read_pc_mat.cpp:148-272, interpret_pairwise_comp.py:19-57).

Format B ("ef+cv"): per row an elias_fano of columns then a compact_vector of
round(dot/d) values; row_index.bin = compact_vector(rows) +
compact_vector(absolute positions)
(reference writer write_sparse_results pairwise_comp_optimized.cpp:256-339,
reader read_pc_mat_cmp.cpp:123-143 + load_neighbors_for_rows :251-363; this
is also what the reference's int16 path emits, :426).

Codec serialization is this framework's (FORMATS.md). The reference
compresses these with `zstd` shellouts; we write uncompressed (its readers
consume pre-decompressed files identically).
"""

from __future__ import annotations

import os

import numpy as np

from .. import codecs


def _group(rows, cols, values):
    order = np.lexsort((cols, rows))
    rows, cols, values = (np.asarray(a, dtype=np.int64)[order]
                          for a in (rows, cols, values))
    unique_rows, start = np.unique(rows, return_index=True)
    bounds = np.append(start, len(rows))
    return rows, cols, values, unique_rows, bounds


def round_half_away(x: np.ndarray) -> np.ndarray:
    """C++ round(): half away from zero (used for value quantization
    round(dot/d), pairwise_comp_optimized.cpp:243,286)."""
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))


# ---------------------------------------------------------------- format A
def write_legacy_prev(folder: str, rows, cols, values, dimension: int) -> None:
    os.makedirs(folder, exist_ok=True)
    rows, cols, values, unique_rows, bounds = _group(rows, cols, values)
    vals32 = round_half_away(values.astype(np.float64) / dimension).astype(np.int32)
    pos = 0
    with open(os.path.join(folder, "matrix.bin"), "wb") as bin_out, \
            open(os.path.join(folder, "row_index.txt"), "w") as index_out:
        for k, row in enumerate(unique_rows):
            s, e = bounds[k], bounds[k + 1]
            index_out.write(f"{row} {pos}\n")
            row_cols = cols[s:e].astype(np.int32)
            deltas = np.empty_like(row_cols)
            deltas[0] = row_cols[0]
            deltas[1:] = np.diff(row_cols)
            bin_out.write(deltas.astype("<i4").tobytes())
            bin_out.write(vals32[s:e].astype("<i4").tobytes())
            pos += 8 * len(row_cols)


def read_legacy_prev(folder: str):
    """-> dict row -> (cols int64, values int32)."""
    index = []
    with open(os.path.join(folder, "row_index.txt")) as f:
        for line in f:
            parts = line.split()
            if len(parts) == 2:
                index.append((int(parts[0]), int(parts[1])))
    blob_path = os.path.join(folder, "matrix.bin")
    size = os.path.getsize(blob_path)
    out = {}
    with open(blob_path, "rb") as f:
        for k, (row, pos) in enumerate(index):
            end = index[k + 1][1] if k + 1 < len(index) else size
            n = (end - pos) // 8
            f.seek(pos)
            deltas = np.frombuffer(f.read(4 * n), dtype="<i4").astype(np.int64)
            vals = np.frombuffer(f.read(4 * n), dtype="<i4")
            out[row] = (np.cumsum(deltas), vals)
    return out


# ---------------------------------------------------------------- format B
def write_legacy_ef(folder: str, rows, cols, values, dimension: int) -> None:
    os.makedirs(folder, exist_ok=True)
    rows, cols, values, unique_rows, bounds = _group(rows, cols, values)
    vals = round_half_away(values.astype(np.float64) / dimension).astype(np.uint64)
    pos = 0
    positions = np.zeros(len(unique_rows), dtype=np.uint64)
    with open(os.path.join(folder, "matrix.bin"), "wb") as bin_out:
        for k, row in enumerate(unique_rows):
            s, e = bounds[k], bounds[k + 1]
            row_cols = cols[s:e].astype(np.uint64)
            positions[k] = pos
            blob = codecs.ef_encode(row_cols, int(row_cols[-1]) + 1)
            blob += codecs.cv_encode(vals[s:e])
            bin_out.write(blob)
            pos += len(blob)
    with open(os.path.join(folder, "row_index.bin"), "wb") as index_out:
        index_out.write(codecs.cv_encode(unique_rows.astype(np.uint64)))
        index_out.write(codecs.cv_encode(positions))


# ---------------------------------------------------------------- format C
def write_legacy_rice(folder: str, rows, cols, values, dimension: int) -> None:
    """The 'rice-everything' historical variant (reference writer
    write_sparse_results_rice, pairwise_comp_optimized.cpp:341-476): per row
    a rice_sequence of delta columns then a rice_sequence of round(dot/d)
    values; row_index.bin = rice(rows) + rice(absolute positions);
    neighbor_start.bin = rice(first columns)."""
    os.makedirs(folder, exist_ok=True)
    rows, cols, values, unique_rows, bounds = _group(rows, cols, values)
    vals = round_half_away(values.astype(np.float64) / dimension).astype(np.uint64)
    positions = np.zeros(len(unique_rows), dtype=np.uint64)
    start_neighbor = np.zeros(len(unique_rows), dtype=np.uint64)
    pos = 0
    with open(os.path.join(folder, "matrix.bin"), "wb") as bin_out:
        for k, row in enumerate(unique_rows):
            s, e = bounds[k], bounds[k + 1]
            row_cols = cols[s:e]
            positions[k] = pos
            start_neighbor[k] = row_cols[0]
            deltas = np.diff(row_cols).astype(np.uint64)
            blob = codecs.rice_encode(deltas)
            blob += codecs.rice_encode(vals[s:e])
            bin_out.write(blob)
            pos += len(blob)
    with open(os.path.join(folder, "row_index.bin"), "wb") as f:
        f.write(codecs.rice_encode(unique_rows.astype(np.uint64)))
        f.write(codecs.rice_encode(positions))
    with open(os.path.join(folder, "neighbor_start.bin"), "wb") as f:
        f.write(codecs.rice_encode(start_neighbor))


def read_legacy_rice(folder: str):
    """-> dict row -> (cols int64, values int64) (reference reader
    load_neighbors_for_rows_rice, read_pc_mat_cmp.cpp:373-514)."""
    with open(os.path.join(folder, "row_index.bin"), "rb") as f:
        blob = f.read()
    rows, consumed = codecs.rice_decode(blob, 0)
    positions, _ = codecs.rice_decode(blob, consumed)
    with open(os.path.join(folder, "neighbor_start.bin"), "rb") as f:
        starts, _ = codecs.rice_decode(f.read(), 0)
    with open(os.path.join(folder, "matrix.bin"), "rb") as f:
        data = f.read()
    out = {}
    for k, (row, pos) in enumerate(zip(rows.astype(np.int64),
                                       positions.astype(np.int64))):
        deltas, used = codecs.rice_decode(data, int(pos))
        vals, _ = codecs.rice_decode(data, int(pos) + used)
        cols = np.empty(len(vals), dtype=np.int64)
        cols[0] = starts[k]
        if len(vals) > 1:
            cols[1:] = cols[0] + np.cumsum(deltas.astype(np.int64))
        out[int(row)] = (cols, vals.astype(np.int64))
    return out


def read_legacy_ef(folder: str):
    """-> dict row -> (cols int64, values int64)."""
    with open(os.path.join(folder, "row_index.bin"), "rb") as f:
        blob = f.read()
    rows, consumed = codecs.cv_decode(blob, 0)
    positions, _ = codecs.cv_decode(blob, consumed)
    with open(os.path.join(folder, "matrix.bin"), "rb") as f:
        data = f.read()
    out = {}
    for row, pos in zip(rows.astype(np.int64), positions.astype(np.int64)):
        cols, used = codecs.ef_decode(data, int(pos))
        vals, _ = codecs.cv_decode(data, int(pos) + used)
        out[int(row)] = (cols.astype(np.int64), vals.astype(np.int64))
    return out
