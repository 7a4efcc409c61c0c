"""Shared conformance helpers: THE oracle-vs-decoded-triples comparison
(previously copy-pasted across ~7 test files — a change to the
conformance contract now lands in one place)."""

import numpy as np

from metagenome_vector_sketches_tpu.matrix.compute import (
    compute_pairwise_oracle)
from metagenome_vector_sketches_tpu.matrix.reader import MatrixReader
from metagenome_vector_sketches_tpu.matrix.writer import quantize_jaccard


def oracle_triple_set(V, norms_sq, d, dtype="int32"):
    """Exact float64 oracle triples as a {(row, col, q)} set."""
    r, c, v = compute_pairwise_oracle(np.asarray(V, dtype=np.int32),
                                      norms_sq, d, dtype)
    q = quantize_jaccard(v, r, c, norms_sq, d)
    return set(zip(r.tolist(), c.tolist(), q.tolist()))


def decoded_triple_set(matrix_folder: str, total: int):
    """All decoded (row, col, q) triples of a matrix folder as a set."""
    r, c, q = MatrixReader(str(matrix_folder)).decode_all_triples(total)
    return set(zip(r.tolist(), c.tolist(), q.tolist()))


def assert_matrix_matches_oracle(V, norms_sq, d, matrix_folder, total,
                                 dtype="int32"):
    assert decoded_triple_set(matrix_folder, total) == \
        oracle_triple_set(V, norms_sq, d, dtype)
