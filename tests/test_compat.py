"""Compat-surface tests: the read_pc_mat_module drop-in, the ANN validate()
ground-truth check, and the legacy query CLI."""

import numpy as np
import pytest

from metagenome_vector_sketches_tpu.io.dbfolder import DbFolder
from metagenome_vector_sketches_tpu.matrix.compute import (
    compute_pairwise_shard, compute_pairwise_oracle)


@pytest.fixture(scope="module")
def toy_setup(tmp_path_factory, ref_toy_dir):
    base = tmp_path_factory.mktemp("compat")
    db_path = str(ref_toy_dir / "toy_db_256")
    matrix = str(base / "matrix")
    compute_pairwise_shard(db_path, matrix, tile_rows=64, tile_cols=64,
                           verbose=False)
    return db_path, matrix, base


def test_read_pc_mat_module_shim(toy_setup):
    import read_pc_mat_module as rpc
    db_path, matrix, base = toy_setup
    db = DbFolder(db_path)
    names, _ = db.names_and_norms()
    qf = base / "q.txt"
    qf.write_text(f"{names[0]}\n{names[5]}\n")
    results = rpc.query(matrix, db_path, str(qf))
    assert len(results) == 2
    assert set(results[0].keys()) == {"id", "neighbor_ids", "jaccard_similarities"}
    assert results[0]["id"] == names[0]
    assert isinstance(results[0]["jaccard_similarities"], np.ndarray)

    rf, cf = base / "r.txt", base / "c.txt"
    rf.write_text("\n".join(names[:3]) + "\n")
    cf.write_text("\n".join(names[:4]) + "\n")
    sliced = rpc.query_sliced(matrix, db_path, str(rf), str(cf))
    assert sliced["row-list"] == names[:3]
    assert sliced["col-list"] == names[:4]
    assert len(sliced["jac-dict"][names[0]]) == 4


def test_ann_validate_ground_truth(ref_toy_dir, tmp_path):
    import shutil
    from metagenome_vector_sketches_tpu.ann.flat_index import index_vectors
    from metagenome_vector_sketches_tpu.ann.validate import validate
    db_dir = tmp_path / "db"
    shutil.copytree(str(ref_toy_dir / "toy_db_2048"), db_dir)
    index_vectors(str(db_dir), verbose=False)
    results = validate(str(db_dir), str(ref_toy_dir / "all_hashes_toy.txt"),
                       n_samples=5, j=0.1, seed=7, verbose=False)
    assert results
    for qid, nid, est, true in results:
        assert abs(est - true) < 0.12
    # self pairs present with both jaccards ~ 1
    selfs = [(e, t) for q, n, e, t in results if q == n]
    assert selfs and all(t == 1.0 for _, t in selfs)


def test_query_ava_matrix_cli(toy_setup, ref_toy_dir, capsys, tmp_path):
    from metagenome_vector_sketches_tpu.matrix.legacy import write_legacy_prev
    from metagenome_vector_sketches_tpu.cli.query_ava_matrix import main
    db_path, _, _ = toy_setup
    db = DbFolder(db_path)
    _, norms = db.names_and_norms()
    vecs = db.load_vectors().astype(np.int32)
    r, c, v = compute_pairwise_oracle(vecs, norms * norms, db.dimension)
    legacy_dir = str(tmp_path / "legacy")
    write_legacy_prev(legacy_dir, r, c, v, db.dimension)
    rc = main(["--matrix", legacy_dir, "--db", db_path,
               "--query_ids", "10", "--top", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Query: 10" in out and "jaccard=" in out
