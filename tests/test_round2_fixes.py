"""Round-2 hardening: persisted max component, certified sweep slack,
multi-member gzip in the native scanner, the fast codec fallback, and the
`jaccard test` subcommand."""

import time

import numpy as np
import pytest

from metagenome_vector_sketches_tpu.io.dbfolder import DbFolder
from metagenome_vector_sketches_tpu.ops import pairwise as pw


# ---------------------------------------------------------------------------
# max_component.txt persistence
# ---------------------------------------------------------------------------

def test_max_component_persisted_and_used(tmp_path):
    from metagenome_vector_sketches_tpu.matrix.compute import scan_max_abs
    rng = np.random.default_rng(0)
    vecs = rng.integers(-900, 901, size=(8, 64)).astype(np.int32)
    vecs[3, 7] = -1234
    db = DbFolder.write(str(tmp_path / "db"), [f"A{i}" for i in range(8)],
                        vecs, 64)
    assert db.max_component() == 1234
    assert scan_max_abs(db) == 1234


def test_max_component_absent_or_stale_falls_back(tmp_path):
    import os
    from metagenome_vector_sketches_tpu.matrix.compute import scan_max_abs
    vecs = np.full((4, 32), 7, dtype=np.int32)
    db = DbFolder.write(str(tmp_path / "db"), list("abcd"), vecs, 32)
    mc = os.path.join(db.path, "max_component.txt")
    os.remove(mc)
    assert db.max_component() is None
    assert scan_max_abs(db) == 7  # streaming scan fallback (foreign db)
    # stale sidecar (older than vectors.bin) is ignored
    with open(mc, "w") as f:
        f.write("99999\n")
    past = os.path.getmtime(os.path.join(db.path, "vectors.bin")) - 10
    os.utime(mc, (past, past))
    assert db.max_component() is None


# ---------------------------------------------------------------------------
# certified sweep slack
# ---------------------------------------------------------------------------

def test_slack_margin_zero_for_realistic_dbs():
    # sketch components are bounded by hash-set sizes (~1e3-1e5); the fixed
    # SLACK_ABS must certify the whole realistic range with zero margin
    for max_abs in (100, 1500, 4000):
        L = pw.pick_limbs(max_abs)
        assert pw.extra_threshold_margin(L, max_abs, 2048) == 0.0


def test_slack_margin_positive_for_extreme_int16():
    L = pw.pick_limbs(32767)
    assert L == 3
    need = pw.required_slack_abs(L, 32767, 2048)
    assert need > float(pw.SLACK_ABS)  # the theoretical gap ADVICE flagged
    assert pw.extra_threshold_margin(L, 32767, 2048) == (need - 16.0) * 10.0


def test_extreme_int16_components_no_false_negatives(tmp_path):
    """End-to-end engine vs oracle on a db with components at the int16
    extremes (the worst case for balanced-Karatsuba float32 cancellation):
    the widened threshold must keep every oracle pair."""
    from metagenome_vector_sketches_tpu.matrix.compute import (
        compute_pairwise_shard, compute_pairwise_oracle)
    from metagenome_vector_sketches_tpu.matrix.reader import MatrixReader
    rng = np.random.default_rng(3)
    n, d = 24, 128
    vecs = rng.choice(np.array([-32768, -32767, -1, 0, 1, 32766, 32767]),
                      size=(n, d), p=[.24, .24, .01, .01, .02, .24, .24]) \
        .astype(np.int32)
    db = DbFolder.write(str(tmp_path / "db"), [f"S{i}" for i in range(n)],
                        vecs, d, use_int16=True)
    _, norms = db.names_and_norms()
    stored = db.load_vectors().astype(np.int32)
    er, ec, ev = compute_pairwise_oracle(stored, norms * norms, d, "int16")
    folder = compute_pairwise_shard(str(tmp_path / "db"), str(tmp_path / "m"),
                                    tile_rows=8, verbose=False)
    reader = MatrixReader(str(tmp_path / "m"))
    got = {}
    for row in range(n):
        dec = reader.load_neighbors_for_rows([row], n)[0]
        if dec is not None:
            cols, q = dec
            for c_, q_ in zip(cols, q):
                got[(row, int(c_))] = int(q_)
    assert set(got) == set(zip(er.tolist(), ec.tolist()))


# ---------------------------------------------------------------------------
# native sigscan: concatenated gzip members
# ---------------------------------------------------------------------------

def test_sigscan_multimember_gzip(tmp_path):
    import gzip
    import zipfile
    from metagenome_vector_sketches_tpu.io import sigzip
    if sigzip._load_native() is None:
        pytest.skip("native sigscan unavailable")
    m1 = gzip.compress(b'[{"signatures":[{"ksize":31,"mins":[11,22]}]}]')
    m2 = gzip.compress(b'[{"signatures":[{"ksize":31,"mins":[33]}]}]')
    path = str(tmp_path / "MM.x.sig.zip")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("signatures/a.sig.gz", m1 + m2)
    # python's gzip.decompress reads every member; the native scanner must
    # match (ADVICE round 1: it used to silently drop members after the first)
    assert sigzip._read_sig_zip_python(path, 31) == {11, 22, 33}
    got = sigzip._read_sig_zip_native(path, 31)
    assert got is None or got == {11, 22, 33}
    assert sigzip.read_sig_zip(path, 31) == {11, 22, 33}


# ---------------------------------------------------------------------------
# codec fallback: loud and fast enough
# ---------------------------------------------------------------------------

def test_pyref_rice_decode_long_unary_and_speed():
    from metagenome_vector_sketches_tpu.codecs import pyref
    v = np.array([0, 1 << 50, 1, (1 << 63) - 1, 2, 0, 0], dtype=np.uint64)
    out, consumed = pyref.rice_decode(pyref.rice_encode(v))
    assert np.array_equal(out, v)
    rng = np.random.default_rng(1)
    big = rng.integers(0, 1 << 25, size=200_000).astype(np.uint64)
    buf = pyref.rice_encode(big)
    t0 = time.perf_counter()
    out, _ = pyref.rice_decode(buf)
    dt = time.perf_counter() - t0
    assert np.array_equal(out, big)
    # vectorized fallback: production-size row decodes must not be
    # pathological. The old per-bit python loop needed >60s for 200k values
    # on this class of host; the budget is generous because the CI host is a
    # single CPU with heavy steal time.
    assert dt < 20.0, f"pyref rice_decode too slow: {dt:.1f}s"


def test_codec_fallback_warns_once(monkeypatch):
    import warnings
    from metagenome_vector_sketches_tpu import codecs
    monkeypatch.setattr(codecs, "_HAVE_NATIVE", False)
    monkeypatch.setattr(codecs, "_warned_fallback", False)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        codecs.cv_encode(np.arange(4, dtype=np.uint64))
        codecs.cv_encode(np.arange(4, dtype=np.uint64))
    assert len([x for x in w if issubclass(x.category, RuntimeWarning)]) == 1


# ---------------------------------------------------------------------------
# jaccard test subcommand
# ---------------------------------------------------------------------------

def test_jaccard_test_subcommand(ref_toy_dir, tmp_path, capsys):
    import shutil
    from metagenome_vector_sketches_tpu.ann.flat_index import index_vectors
    from metagenome_vector_sketches_tpu.cli.jaccard import main
    db_dir = tmp_path / "db"
    shutil.copytree(str(ref_toy_dir / "toy_db_2048"), db_dir)
    index_vectors(str(db_dir), verbose=False)
    rc = main(["test", str(db_dir), str(ref_toy_dir / "all_hashes_toy.txt"),
               "-n", "3", "-j", "0.1", "--seed", "11"])
    assert rc == 0
