"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from metagenome_vector_sketches_tpu.parallel.mesh import make_mesh, row_sharding, replicated
from metagenome_vector_sketches_tpu.parallel.pairwise import (
    sharded_pairwise_counts, distributed_topk,
)
from metagenome_vector_sketches_tpu.ops import pairwise as pw
from metagenome_vector_sketches_tpu.ann.flat_index import normalize_l2, FlatIPIndex


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def test_sharded_pairwise_counts_matches_oracle(mesh8):
    rng = np.random.default_rng(31)
    N, d = 64, 128
    V = rng.integers(-300, 300, size=(N, d)).astype(np.int32)
    norms_sq = np.einsum("ij,ij->i", V.astype(np.float64), V.astype(np.float64))
    L = pw.pick_limbs(300)
    limbs = np.asarray(pw.decompose_limbs(jnp.asarray(V), L))
    limbs_sh = jax.device_put(jnp.asarray(limbs),
                              jax.sharding.NamedSharding(
                                  mesh8, jax.sharding.PartitionSpec(None, "data", None)))
    thr_sh = jax.device_put(jnp.asarray(norms_sq.astype(np.float32)),
                            row_sharding(mesh8))
    counts = np.asarray(sharded_pairwise_counts(mesh8, limbs_sh, thr_sh, d))
    dots = V.astype(np.int64) @ V.astype(np.int64).T
    want = (dots.astype(np.float64) / d >
            0.05 * (norms_sq[:, None] + norms_sq[None, :])).sum(axis=1)
    np.testing.assert_array_equal(counts, want.astype(np.int32))


def test_distributed_topk_matches_single_chip(mesh8):
    rng = np.random.default_rng(32)
    N, d, B, k = 256, 64, 5, 7
    V = normalize_l2(rng.normal(size=(N, d)).astype(np.float32))
    Q = normalize_l2(rng.normal(size=(B, d)).astype(np.float32))
    V_sh = jax.device_put(jnp.asarray(V), row_sharding(mesh8))
    Q_re = jax.device_put(jnp.asarray(Q), replicated(mesh8))
    D, I = distributed_topk(mesh8, Q_re, V_sh, k)
    D, I = np.asarray(D), np.asarray(I)
    scores = Q.astype(np.float64) @ V.astype(np.float64).T
    for b in range(B):
        want = set(np.argsort(-scores[b])[:k].tolist())
        got = set(I[b].tolist())
        if got != want:  # ties may reorder across chip boundaries
            np.testing.assert_allclose(np.sort(scores[b][list(got)]),
                                       np.sort(scores[b][list(want)]), rtol=1e-6)


def test_distributed_projection_batch(mesh8):
    """Data-parallel projection: shard the accession batch dim over the mesh
    and check bit-equality with the host path."""
    from metagenome_vector_sketches_tpu.ops.projection import (
        project_device_batch, project_host)
    from metagenome_vector_sketches_tpu.ops.splitmix import split_u64
    rng = np.random.default_rng(33)
    B, H, d = 16, 128, 128
    sets = rng.integers(0, 1 << 64, size=(B, H), dtype=np.uint64)
    counts = rng.integers(1, H + 1, size=B).astype(np.int32)
    for b in range(B):
        sets[b, counts[b]:] = 0
    hi, lo = split_u64(sets)
    sh = row_sharding(mesh8)
    out = project_device_batch(jax.device_put(jnp.asarray(hi), sh),
                               jax.device_put(jnp.asarray(lo), sh),
                               jax.device_put(jnp.asarray(counts), sh), d)
    out = np.asarray(out)
    for b in range(B):
        want = project_host(sets[b, :counts[b]], d)
        np.testing.assert_array_equal(out[b], want)
