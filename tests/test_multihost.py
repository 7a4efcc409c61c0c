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


def test_multihost_pairwise_wrapper(tmp_path, ref_toy_dir):
    folders = multihost.compute_pairwise_multihost(
        str(ref_toy_dir / "toy_db_256"), str(tmp_path / "m"), num_shards=2,
        tile_rows=64, tile_cols=64, verbose=False)
    assert len(folders) == 2
    from metagenome_vector_sketches_tpu.matrix.reader import discover_shards
    assert discover_shards(str(tmp_path / "m")) == 2
