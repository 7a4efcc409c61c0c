"""Edge cases: single-neighbor rows (no rice blob in the format), empty
shards, one-vector databases, ingest CLI mains."""

import numpy as np

from metagenome_vector_sketches_tpu.matrix import writer, reader
from metagenome_vector_sketches_tpu.io.dbfolder import DbFolder


def test_single_neighbor_row_round_trip(tmp_path):
    """A row with exactly one neighbor stores no rice blob
    (reference pairwise_comp_optimized.cpp:732; reader :650)."""
    folder = str(tmp_path / "shard_0")
    norms_sq = np.array([4.0, 9.0, 16.0])
    # row 0: one neighbor (itself); row 2: two neighbors
    rows = np.array([0, 2, 2])
    cols = np.array([0, 1, 2])
    vals = np.array([8, 5, 30], dtype=np.int64)
    writer.write_shard(folder, rows, cols, vals, norms_sq, dimension=2)
    sr = reader.ShardReader(folder)
    c0, q0 = sr.decode_row(0)
    assert list(c0) == [0] and len(q0) == 1
    c2, q2 = sr.decode_row(2)
    assert list(c2) == [1, 2]
    assert sr.decode_row(1) is None


def test_empty_shard_round_trip(tmp_path):
    folder = str(tmp_path / "shard_0")
    e = np.empty(0, dtype=np.int64)
    writer.write_shard(folder, e, e, e, np.array([1.0]), dimension=2)
    sr = reader.ShardReader(folder)
    assert sr.index is not None and len(sr.index.rows) == 0
    assert sr.decode_row(0) is None
    mr = reader.MatrixReader(str(tmp_path))
    r, c, q = mr.decode_all_triples(1)
    assert len(r) == 0


def test_one_vector_database(tmp_path):
    from metagenome_vector_sketches_tpu.matrix.compute import compute_pairwise_shard
    from metagenome_vector_sketches_tpu.ops.projection import project_host
    v = project_host(np.array([42, 77], dtype=np.uint64), 64)[None]
    db = DbFolder.write(str(tmp_path / "db"), ["ONLY"], v, 64)
    compute_pairwise_shard(db.path, str(tmp_path / "m"), tile_rows=32,
                           tile_cols=32, verbose=False)
    mr = reader.MatrixReader(str(tmp_path / "m"))
    r, c, q = mr.decode_all_triples(1)
    # the self-pair survives with q ~ 255
    assert list(r) == [0] and list(c) == [0] and q[0] >= 254


def test_ingest_cli_mains(tmp_path, toy_sig_dir):
    import shutil
    from metagenome_vector_sketches_tpu.cli.project_everything import main
    # tiny signature subset for speed
    subset = tmp_path / "sigs"
    subset.mkdir()
    import os
    names = sorted(os.listdir(toy_sig_dir))[:3]
    for n in names:
        shutil.copy(str(toy_sig_dir / n), subset / n)
    hf = tmp_path / "h.txt"
    assert main(["convert", str(subset), str(hf), "-t", "2"]) == 0
    assert main(["sketch", str(hf), str(tmp_path / "db"), "-d", "64"]) == 0
    db = DbFolder(str(tmp_path / "db"))
    assert db.num_vectors == 3 and db.dimension == 64


def test_standalone_projection_cli(tmp_path, capsys):
    from metagenome_vector_sketches_tpu.cli.standalone_projection import main
    from metagenome_vector_sketches_tpu.ops.projection import project_host
    f = tmp_path / "hashes.txt"
    f.write_text("5 7\n\n11\n")
    assert main([str(f), "64"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert len(out) == 3
    want = project_host(np.array([5, 7], dtype=np.uint64), 64)
    got = np.array(out[0].split(), dtype=np.float64)
    np.testing.assert_array_equal(got.astype(np.int32), want)
    assert np.all(np.array(out[1].split(), dtype=np.float64) == 0)  # empty line
