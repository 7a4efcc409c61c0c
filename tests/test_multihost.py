import numpy as np
import pytest

from metagenome_vector_sketches_tpu.parallel import multihost
from metagenome_vector_sketches_tpu.ann.flat_index import normalize_l2
from metagenome_vector_sketches_tpu.ann.distributed import DistributedFlatIPIndex
from metagenome_vector_sketches_tpu.parallel.mesh import make_mesh


def test_host_shards_single_process():
    assert multihost.host_shards(5) == [0, 1, 2, 3, 4]
    assert multihost.process_info() == (0, 1)


def test_initialize_noop_without_env(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    multihost.initialize()  # must not raise on single host


def test_distributed_index_matches_flat():
    from metagenome_vector_sketches_tpu.ann.flat_index import FlatIPIndex
    rng = np.random.default_rng(51)
    V = normalize_l2(rng.normal(size=(203, 64)).astype(np.float32))  # not % 8
    Q = normalize_l2(rng.normal(size=(4, 64)).astype(np.float32))
    mesh = make_mesh(8)
    dist = DistributedFlatIPIndex(V, mesh=mesh)
    flat = FlatIPIndex(V)
    Dd, Id = dist.search(Q, 7)
    Df, If = flat.search(Q, 7)
    scores = Q.astype(np.float64) @ V.astype(np.float64).T
    for b in range(4):
        got, want = set(Id[b].tolist()), set(If[b].tolist())
        if got != want:  # ties may swap
            np.testing.assert_allclose(np.sort(scores[b][list(got)]),
                                       np.sort(scores[b][list(want)]), rtol=1e-6)
    assert np.all(Id < 203)


def test_flat_from_process_shards_single_process():
    """f32 from_process_shards (explicit row-id path through
    distributed_topk) must match the padded-contiguous build exactly on a
    1-process mesh, including a row count that is not a mesh multiple."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(57)
    V = normalize_l2(rng.normal(size=(117, 48)).astype(np.float32))
    Q = normalize_l2(rng.normal(size=(3, 48)).astype(np.float32))
    mesh = make_mesh(8)
    ref = DistributedFlatIPIndex(V, mesh=mesh)
    got = DistributedFlatIPIndex.from_process_shards(V, 48, mesh=mesh)
    assert got.ntotal == 117
    Dr, Ir = ref.search(Q, 9)
    Dg, Ig = got.search(Q, 9)
    scores = Q.astype(np.float64) @ V.astype(np.float64).T
    for b in range(3):
        same = set(Ig[b].tolist()) == set(Ir[b].tolist())
        if not same:  # ties may swap
            np.testing.assert_allclose(
                np.sort(scores[b][Ig[b]]), np.sort(scores[b][Ir[b]]),
                rtol=1e-6)
    np.testing.assert_allclose(np.sort(Dg, axis=1), np.sort(Dr, axis=1),
                               rtol=1e-6)


def test_multihost_pairwise_wrapper(tmp_path, ref_toy_dir):
    folders = multihost.compute_pairwise_multihost(
        str(ref_toy_dir / "toy_db_256"), str(tmp_path / "m"), num_shards=2,
        tile_rows=64, tile_cols=64, verbose=False)
    assert len(folders) == 2
    from metagenome_vector_sketches_tpu.matrix.reader import discover_shards
    assert discover_shards(str(tmp_path / "m")) == 2


def test_initialize_reads_full_env_triple(monkeypatch):
    """The documented JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars must be
    read (not just the address) — otherwise env-driven launches raise
    'Number of processes must be defined'."""
    import jax
    from metagenome_vector_sketches_tpu.parallel import multihost
    seen = {}

    def fake_init(coordinator_address=None, num_processes=None,
                  process_id=None):
        seen.update(addr=coordinator_address, n=num_processes, p=process_id)

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "h:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "1")
    multihost.initialize()
    assert seen == {"addr": "h:1234", "n": 4, "p": 1}


def test_serving_mesh_semantics():
    import pytest
    from metagenome_vector_sketches_tpu.parallel.mesh import serving_mesh
    assert serving_mesh(1) is None
    m = serving_mesh(0)          # all local devices (conftest gives 8)
    assert m is not None and m.devices.size == 8
    assert serving_mesh(2).devices.size == 2
    with pytest.raises(ValueError):
        serving_mesh(-1)
    with pytest.raises(ValueError):
        serving_mesh(4096)
