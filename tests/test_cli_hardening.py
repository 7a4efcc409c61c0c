"""Round-3 review hardening of the CLI/analysis layer: bounds on
matrix/db mismatches, missing-flag validation, version flag, reader
reuse, percentile clamps, clusters dtype/overlay fixes."""

import os

import numpy as np
import pytest

from metagenome_vector_sketches_tpu.io.dbfolder import DbFolder


def _toy_db(tmp_path, n=4, d=16, name="db", use_int16=False):
    rng = np.random.default_rng(3)
    V = rng.integers(-5, 6, size=(n, d)).astype(np.int32)
    return DbFolder.write(str(tmp_path / name), [f"S{i}" for i in range(n)],
                          V, d, use_int16=use_int16), V


def test_query_ava_out_of_range_query_and_neighbor(tmp_path, capsys):
    from metagenome_vector_sketches_tpu.matrix.legacy import write_legacy_prev
    from metagenome_vector_sketches_tpu.cli.query_ava_matrix import main
    db, V = _toy_db(tmp_path)
    mdir = str(tmp_path / "legacy")
    # row 0 references neighbor column 99 (beyond the 4-row norms file)
    write_legacy_prev(mdir, np.array([0, 0]), np.array([1, 99]),
                      np.array([80, 80]), 16)
    for fname in ("dimension.txt", "vector_norms.txt", "dtype.txt"):
        src = os.path.join(db.path, fname)
        if os.path.exists(src):
            with open(src) as f, open(os.path.join(mdir, fname), "w") as g:
                g.write(f.read())
    rc = main(["--matrix_folder", mdir, "--query_ids", "0", "999"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "UNKNOWN" in out                 # the col-99 neighbor
    assert "Query: 999 (UNKNOWN)" in out    # the out-of-range query
    assert "No neighbors found" in out


def test_query_pc_mat_requires_db(capsys):
    from metagenome_vector_sketches_tpu.cli.query_pc_mat import main
    with pytest.raises(SystemExit):
        main(["--matrix", "m", "--query_ids", "X"])
    assert "db folder is required" in capsys.readouterr().err


def test_jaccard_version_standalone(capsys):
    from metagenome_vector_sketches_tpu.cli.jaccard import main
    assert main(["-v"]) == 0
    assert "Version:" in capsys.readouterr().out
    with pytest.raises(SystemExit):   # no command and no -v still errors
        main([])


def test_query_engine_reader_cache(tmp_path):
    from metagenome_vector_sketches_tpu.query import engine
    from metagenome_vector_sketches_tpu.matrix.compute import (
        compute_pairwise_shard)
    db, V = _toy_db(tmp_path, n=6, d=16)
    mdir = str(tmp_path / "mat")
    compute_pairwise_shard(db.path, mdir, verbose=False)
    _, norms = db.names_and_norms_f32()
    r1 = engine.query(mdir, [0], norms, [f"S{i}" for i in range(6)])
    first = engine._reader(mdir)
    r2 = engine.query(mdir, [1], norms, [f"S{i}" for i in range(6)])
    assert engine._reader(mdir) is first          # reused across batches
    assert r1[0].self_id == "S0" and r2[0].self_id == "S1"


def test_accuracy_small_trials_percentiles_ordered():
    from metagenome_vector_sketches_tpu.analysis.accuracy import simulate_cell
    out = simulate_cell(1000, 1000, 0.5, dimension=64, sampling=10,
                        n_trials=10)
    p1, p5, p50, p95, pmax = out["percentiles"]
    assert p1 <= p5 <= p50 <= p95 <= pmax


def test_clusters_int16_db_and_overlay(tmp_path):
    mpl = pytest.importorskip("matplotlib")
    mpl.use("Agg")
    from metagenome_vector_sketches_tpu.analysis.clusters import (
        load_vectors, plot_clusters)
    rng = np.random.default_rng(1)
    V = rng.integers(-300, 301, size=(5, 32)).astype(np.int32)
    db = DbFolder.write(str(tmp_path / "db16"), [f"S{i}" for i in range(5)],
                        V, 32, use_int16=True)
    vecs, names = load_vectors(db.path)
    # int16 db parsed with the stored dtype: values round-trip exactly
    kept = np.array([n for n in names])
    assert vecs.dtype == np.int16 and vecs.shape[1] == 32
    # big_vectors overlay shares the main figure
    V[:2].astype(np.int16).tofile(os.path.join(db.path, "big_vectors.bin"))
    plot_clusters(db.path, show=False,
                  save=str(tmp_path / "plot.png"))
    import matplotlib.pyplot as plt
    fig = plt.gcf()
    labels = [t.get_text() for t in (fig.legends[0].texts
                                     if fig.legends else
                                     fig.axes[0].get_legend().texts)]
    assert "big_vectors" in labels
    plt.close("all")


def test_interpret_unknown_neighbor(tmp_path, capsys):
    from metagenome_vector_sketches_tpu.matrix.legacy import write_legacy_prev
    from metagenome_vector_sketches_tpu.analysis.interpret import (
        print_row_jaccards)
    db, V = _toy_db(tmp_path, n=3, d=16)
    mdir = str(tmp_path / "legacy")
    write_legacy_prev(mdir, np.array([1, 1]), np.array([0, 42]),
                      np.array([64, 64]), 16)
    print_row_jaccards(mdir, db.path, row=1, legacy=True)
    out = capsys.readouterr().out
    assert "UNKNOWN" in out
    print_row_jaccards(mdir, db.path, row=77, legacy=True)
    assert "not found" in capsys.readouterr().out


def test_search_index_device_residency_cache(tmp_path, toy_sig_dir):
    from metagenome_vector_sketches_tpu.ann import search as asearch
    from metagenome_vector_sketches_tpu.ann.flat_index import index_vectors
    from metagenome_vector_sketches_tpu.io.ingest import convert, sketch
    convert(str(toy_sig_dir), str(tmp_path / "ah.txt"),
            verbose=False)
    sketch(str(tmp_path / "ah.txt"), str(tmp_path / "db"), dimension=256,
           verbose=False)
    index_vectors(str(tmp_path / "db"))
    qf = tmp_path / "q.txt"
    with open(tmp_path / "ah.txt") as f:
        qf.write_text(f.readline())
    asearch.clear_index_cache()
    r1 = asearch.search_index(str(tmp_path / "db"), str(qf), 0.1,
                              verbose=False)
    idx_first = asearch._INDEX_CACHE.get("value")
    assert idx_first is not None
    r2 = asearch.search_index(str(tmp_path / "db"), str(qf), 0.1,
                              verbose=False)
    assert asearch._INDEX_CACHE.get("value") is idx_first  # reused
    # identical query against the cached index must give identical results
    assert r1 == r2
    # a rebuilt artifact evicts (mtime/size key)
    index_vectors(str(tmp_path / "db"))
    os.utime(os.path.join(str(tmp_path / "db"), "faiss.index"), ns=(2, 2))
    asearch.search_index(str(tmp_path / "db"), str(qf), 0.1, verbose=False)
    assert asearch._INDEX_CACHE.get("value") is not idx_first
    asearch.clear_index_cache()
