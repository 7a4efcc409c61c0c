"""Query stack gates (SURVEY.md §7.3 step 4): top-k ordering and
dequantization, sliced matrices, CLI outputs (per-query files, csv/npy)."""


import numpy as np
import pytest

from metagenome_vector_sketches_tpu.io.dbfolder import DbFolder
from metagenome_vector_sketches_tpu.matrix.compute import (
    compute_pairwise_shard, compute_pairwise_oracle,
)
from metagenome_vector_sketches_tpu.matrix.writer import quantize_jaccard
from metagenome_vector_sketches_tpu.query import engine


@pytest.fixture(scope="module")
def toy_matrix(tmp_path_factory, ref_toy_dir):
    db_path = str(ref_toy_dir / "toy_db_256")
    out = str(tmp_path_factory.mktemp("mat") / "matrix")
    for s in range(2):
        compute_pairwise_shard(db_path, out, num_shards=2, shard_idx=s,
                               tile_rows=64, tile_cols=64, verbose=False)
    return db_path, out


@pytest.fixture(scope="module")
def oracle(ref_toy_dir):
    db = DbFolder(str(ref_toy_dir / "toy_db_256"))
    _, norms = db.names_and_norms()
    norms_sq = norms * norms
    vecs = db.load_vectors().astype(np.int32)
    r, c, v = compute_pairwise_oracle(vecs, norms_sq, db.dimension)
    q = quantize_jaccard(v, r, c, norms_sq, db.dimension)
    return db, r, c, q


def test_query_matches_oracle_ordering(toy_matrix, oracle):
    db_path, matrix = toy_matrix
    db, r, c, q = oracle
    identifiers, norms = db.names_and_norms_f32()
    queries = [0, 10, 12, 60]
    results = engine.query(matrix, queries, norms, identifiers)
    for qi, res in zip(queries, results):
        mask = r == qi
        want_cols, want_q = c[mask], q[mask]
        order = np.argsort(-want_q.astype(np.int64), kind="stable")
        want_ids = [identifiers[j] for j in want_cols[order]]
        assert res.self_id == identifiers[qi]
        assert res.neighbor_ids == want_ids
        np.testing.assert_allclose(
            res.jaccard_similarities,
            (want_q[order] / 255.0).astype(np.float32), rtol=0)
        # self is the top hit (q=255; ties broken by ascending column,
        # and no column precedes the self pair at equal q here)
        assert res.jaccard_similarities[0] == np.float32(1.0)
        assert identifiers[qi] in res.neighbor_ids[
            : int((res.jaccard_similarities == 1.0).sum())]


def test_query_by_accession_strings(toy_matrix):
    db_path, matrix = toy_matrix
    db = DbFolder(db_path)
    id_to_index = db.id_to_index()
    assert engine.parse_query_to_index("12", id_to_index) == 12
    some_name = next(iter(id_to_index))
    assert engine.parse_query_to_index(some_name, id_to_index) == id_to_index[some_name]
    assert engine.parse_query_to_index("NOPE", id_to_index) == -1


def test_query_sliced(toy_matrix, oracle):
    db_path, matrix = toy_matrix
    db, r, c, q = oracle
    identifiers, norms = db.names_and_norms_f32()
    rows = [0, 5, 9]
    cols = [0, 5, 9, 33]
    mat = engine.query_sliced(matrix, rows, cols, len(identifiers), norms)
    assert mat.shape == (3, 4)
    lookup = {(int(a), int(b)): int(x) for a, b, x in zip(r, c, q)}
    for i, ri in enumerate(rows):
        for j, cj in enumerate(cols):
            want = lookup.get((ri, cj), 0) / 255.0
            assert mat[i, j] == np.float32(want)


def test_query_pc_mat_cli_topk(toy_matrix, tmp_path):
    db_path, matrix = toy_matrix
    from metagenome_vector_sketches_tpu.cli.query_pc_mat import main
    out = tmp_path / "out.csv"
    rc = main(["--matrix", matrix, "--db", db_path,
               "--query_ids", "10", "12",
               "--top", "5", "--write_to_file", str(out)])
    assert rc == 0
    db = DbFolder(db_path)
    identifiers, norms = db.names_and_norms_f32()
    for qi in (10, 12):
        per_query = tmp_path / f"{identifiers[qi]}_out.csv"
        assert per_query.exists()
        lines = per_query.read_text().splitlines()
        assert lines[0] == "ID,Jaccard"
        assert 1 <= len(lines) - 1 <= 5
        name, jac = lines[1].split(",")
        assert float(jac) <= 1.0


def test_query_pc_mat_cli_sliced_npy(toy_matrix, tmp_path):
    db_path, matrix = toy_matrix
    from metagenome_vector_sketches_tpu.cli.query_pc_mat import main
    db = DbFolder(db_path)
    identifiers, norms = db.names_and_norms_f32()
    rf, cf = tmp_path / "rows.txt", tmp_path / "cols.txt"
    rf.write_text("\n".join(identifiers[:4]) + "\n")
    cf.write_text("\n".join(identifiers[:6]) + "\n")
    out = tmp_path / "slice.npy"
    rc = main(["--matrix", matrix, "--db", db_path,
               "--row_file", str(rf), "--col_file", str(cf),
               "--write_to_file", str(out)])
    assert rc == 0
    arr = np.load(out)
    assert arr.shape == (4, 6) and arr.dtype == np.float32
    want = engine.query_sliced(matrix, list(range(4)), list(range(6)),
                               len(identifiers), norms)
    np.testing.assert_array_equal(arr, want)
    # csv flavor
    out2 = tmp_path / "slice.csv"
    rc = main(["--matrix", matrix, "--db", db_path,
               "--row_file", str(rf), "--col_file", str(cf),
               "--write_to_file", str(out2)])
    assert rc == 0
    lines = out2.read_text().splitlines()
    assert lines[0].startswith("Accession,")
    assert len(lines) == 5


def test_bad_extension_aborts(toy_matrix, tmp_path):
    db_path, matrix = toy_matrix
    from metagenome_vector_sketches_tpu.cli.query_pc_mat import main
    with pytest.raises(SystemExit):
        main(["--matrix", matrix, "--db", db_path, "--query_ids", "1",
              "--write_to_file", str(tmp_path / "bad.npy")])


def test_batched_row_decode_equals_per_row(tmp_path):
    """mvs_read_matrix_rows (one native call per query batch) must decode
    identically to the per-row path, across shards and including absent
    rows; the bits-layout fallback stays on the per-row path."""
    from metagenome_vector_sketches_tpu.matrix import writer
    from metagenome_vector_sketches_tpu.matrix.reader import MatrixReader
    rng = np.random.default_rng(71)
    N = 400
    rows = np.repeat(np.arange(0, N, 2), 5)     # odd rows absent
    cols = (rows + np.tile(np.arange(5), N // 2) * 11) % N
    key = np.unique(rows * N + cols)
    rows, cols = key // N, key % N
    vals = rng.integers(1, 10**8, size=len(rows)).astype(np.int64)
    ns = rng.uniform(1e3, 1e5, size=N)
    writer.write_shard(str(tmp_path / "shard_0"), rows, cols, vals, ns, 256)
    reader = MatrixReader(str(tmp_path))
    sh = reader.shard(0)
    queries = rng.integers(0, N, size=200).tolist() + [1, 3]  # absent rows
    batched = sh.decode_rows_batch(queries)
    for q_row, dec in zip(queries, batched):
        want = sh.decode_row(q_row)
        if want is None:
            assert dec is None
        else:
            np.testing.assert_array_equal(dec[0], want[0])
            np.testing.assert_array_equal(dec[1], want[1])
