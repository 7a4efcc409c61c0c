"""Pallas sweep kernel equivalence (interpreter mode on CPU; the compiled
path is exercised on real TPU by bench.py and the engine fast path)."""

import numpy as np
import jax.numpy as jnp

from metagenome_vector_sketches_tpu.ops import pairwise as pw
from metagenome_vector_sketches_tpu.ops.pallas_pairwise import pallas_sweep_counts


def _setup(N, d, max_abs=300, seed=5):
    rng = np.random.default_rng(seed)
    V = rng.integers(-max_abs, max_abs + 1, size=(N, d)).astype(np.int32)
    norms = (np.einsum("ij,ij->i", V.astype(np.float64),
                       V.astype(np.float64)) / d).astype(np.float32)
    L = pw.pick_limbs(max_abs)
    return pw.decompose_planes(jnp.asarray(V), L), jnp.asarray(norms)


def test_pallas_matches_xla_full_grid():
    limbs, thr = _setup(64, 128)
    block = 16
    nt = 64 // block
    coords = jnp.asarray(np.array([(r, c) for r in range(nt) for c in range(nt)],
                                  dtype=np.int32))
    want = np.asarray(pw.sweep_counts(limbs, thr, coords, block)).reshape(nt, nt)
    got = np.asarray(pallas_sweep_counts(limbs, thr, block=block, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_row_range():
    limbs, thr = _setup(64, 128)
    block, nt = 16, 4
    coords = jnp.asarray(np.array([(r, c) for r in range(1, 3) for c in range(nt)],
                                  dtype=np.int32))
    want = np.asarray(pw.sweep_counts(limbs, thr, coords, block)).reshape(2, nt)
    got = np.asarray(pallas_sweep_counts(limbs, thr, row_t0=1, row_t1=3,
                                         block=block, interpret=True))
    np.testing.assert_array_equal(got, want)
