import numpy as np
import pytest

from metagenome_vector_sketches_tpu.analysis import accuracy
from metagenome_vector_sketches_tpu.analysis.clusters import load_vectors, make_pca
from metagenome_vector_sketches_tpu.matrix import legacy


def test_simulate_cell_envelope():
    """The de-facto accuracy spec: RMSE small at d=2048, scale=1000
    (reference heatmap scale <= 0.03 for comparable-size sets)."""
    cell = accuracy.simulate_cell(1_000_000, 1_000_000, 0.2, dimension=2048,
                                  sampling=1000, n_trials=200,
                                  rng=np.random.default_rng(0))
    assert cell is not None
    assert cell["rmse_rp"] < 0.03
    assert cell["rmse_fmh"] < 0.03
    p1, p5, p50, p95, p99 = cell["percentiles"]
    assert p1 <= p5 <= p50 <= p95 <= p99


def test_simulate_cell_infeasible_returns_none():
    # a large-but-feasible cell returns a result dict
    assert accuracy.simulate_cell(10_000, 10_000, 0.5,
                                  n_trials=10) is not None
    # jaccard implying intersection > min(size) is skipped
    assert accuracy.simulate_cell(100, 1_000_000_000, 0.5, n_trials=10) is None


def test_error_vs_dimension_decreases():
    curve = accuracy.error_vs_dimension(n_elements=2000, n_sets=400,
                                        dimensions=(256, 4096), verbose=False)
    assert curve[0][1] > curve[1][1]  # error shrinks with dimension


def test_grid_and_pickle(tmp_path):
    out = accuracy.compute_error_for_all_points_in_space(
        sizes=[10_000, 100_000], jaccards=[0, 0.5], n_trials=50,
        out_pickle=str(tmp_path / "err.pkl"), verbose=False)
    assert len(out) > 0
    import pickle
    with open(tmp_path / "err.pkl", "rb") as f:
        assert pickle.load(f) == out


def test_clusters_load_and_pca(ref_toy_dir):
    vectors, names = load_vectors(str(ref_toy_dir / "toy_db_256"))
    assert len(vectors) == len(names) > 0
    pca = make_pca()
    res = pca.fit_transform(vectors)
    assert res.shape[0] == len(vectors)
    assert pca.explained_variance_ratio_[0] >= pca.explained_variance_ratio_[1]


@pytest.mark.parametrize("fmt", ["prev", "ef", "rice"])
def test_legacy_round_trip(tmp_path, fmt):
    rng = np.random.default_rng(41)
    rows = np.repeat(np.arange(5), 7)
    cols = np.tile(np.sort(rng.choice(100, size=7, replace=False)), 5)
    vals = rng.integers(1, 10**7, size=35)
    d = 2048
    folder = str(tmp_path / fmt)
    if fmt == "prev":
        legacy.write_legacy_prev(folder, rows, cols, vals, d)
        got = legacy.read_legacy_prev(folder)
    elif fmt == "rice":
        legacy.write_legacy_rice(folder, rows, cols, vals, d)
        got = legacy.read_legacy_rice(folder)
    else:
        legacy.write_legacy_ef(folder, rows, cols, vals, d)
        got = legacy.read_legacy_ef(folder)
    want_vals = legacy.round_half_away(vals.astype(np.float64) / d)
    for r in range(5):
        mask = rows == r
        np.testing.assert_array_equal(np.sort(got[r][0]), np.sort(cols[mask]))
        order = np.argsort(cols[mask])
        np.testing.assert_array_equal(got[r][1], want_vals[mask][order])


def test_legacy_sorted_round_trip(tmp_path):
    """Format D (sorted-by-jaccard uint16): self pairs dropped, rows come
    back jaccard-descending with exact quantized values."""
    rng = np.random.default_rng(43)
    n, d = 6, 2048
    rows = np.repeat(np.arange(n), n)
    cols = np.tile(np.arange(n), n)
    norms_sq = rng.uniform(500, 5000, size=n)
    dots = rng.integers(1, int(0.4 * d * 500), size=n * n).astype(np.int64)
    folder = str(tmp_path / "sorted")
    legacy.write_legacy_sorted(folder, rows, cols, dots, norms_sq, d)
    got = legacy.read_legacy_sorted(folder)
    inter = dots.astype(np.float64) / d
    jac = np.minimum(inter / (norms_sq[rows] + norms_sq[cols] - inter), 1.0)
    q = legacy.round_half_away(jac * 65535.0).astype(np.int64)
    for r in range(n):
        mask = (rows == r) & (cols != r)        # self pairs are dropped
        gc, gq = got[r]
        assert np.all(np.diff(gq) <= 0)          # jaccard-descending
        np.testing.assert_array_equal(np.sort(gc), np.sort(cols[mask]))
        want = {int(c): int(v) for c, v in zip(cols[mask], q[mask])}
        for c, v in zip(gc, gq):
            assert want[int(c)] == int(v)


def test_interpret_and_export(tmp_path, ref_toy_dir):
    from metagenome_vector_sketches_tpu.matrix.compute import compute_pairwise_shard
    from metagenome_vector_sketches_tpu.analysis.interpret import neighbor_count_histogram
    from metagenome_vector_sketches_tpu.analysis.export import export_npz
    from metagenome_vector_sketches_tpu.io.dbfolder import DbFolder
    db_path = str(ref_toy_dir / "toy_db_256")
    out = str(tmp_path / "m")
    compute_pairwise_shard(db_path, out, tile_rows=64, tile_cols=64, verbose=False)
    total = DbFolder(db_path).num_vectors
    rows, counts = neighbor_count_histogram(out, total)
    assert len(rows) > 0 and np.all(counts >= 1)
    npz = export_npz(out, total, str(tmp_path / "coo.npz"))
    data = np.load(npz)
    assert set(data.files) == {"row", "col", "data"}
    assert len(data["row"]) == counts.sum()
