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


def test_pallas_asymmetric_blocks():
    """block != block_j (the P=6 VMEM escape, r5): per-(block x block_j)
    tile counts must equal the vertical sums of the symmetric XLA tiles,
    for an int16-range db that actually produces 6 planes."""
    limbs, thr = _setup(64, 128, max_abs=30000)
    assert limbs.shape[0] == 6
    sub = 16
    nt = 64 // sub
    coords = jnp.asarray(np.array([(r, c) for r in range(nt) for c in range(nt)],
                                  dtype=np.int32))
    ref = np.asarray(pw.sweep_counts(limbs, thr, coords, sub)).reshape(nt, nt)
    got = np.asarray(pallas_sweep_counts(limbs, thr, block=32, block_j=16,
                                         interpret=True))
    np.testing.assert_array_equal(got, ref.reshape(nt // 2, 2, nt).sum(axis=1))
    # row-windowed asymmetric grid (the engine's begin/end_row slicing)
    got2 = np.asarray(pallas_sweep_counts(limbs, thr, row_t0=1, row_t1=2,
                                          block=32, block_j=16,
                                          interpret=True))
    np.testing.assert_array_equal(
        got2, ref.reshape(nt // 2, 2, nt).sum(axis=1)[1:2])


def test_pallas_row_range():
    limbs, thr = _setup(64, 128)
    block, nt = 16, 4
    coords = jnp.asarray(np.array([(r, c) for r in range(1, 3) for c in range(nt)],
                                  dtype=np.int32))
    want = np.asarray(pw.sweep_counts(limbs, thr, coords, block)).reshape(2, nt)
    got = np.asarray(pallas_sweep_counts(limbs, thr, row_t0=1, row_t1=3,
                                         block=block, interpret=True))
    np.testing.assert_array_equal(got, want)
