"""Round-3 hardening: ADVICE round-2 items (native zero-size row rejection,
streaming-path stale-sidecar verification)."""

import os

import numpy as np
import pytest

from metagenome_vector_sketches_tpu.io.dbfolder import DbFolder


def test_native_zero_size_row_rejected():
    """A corrupt row whose compact-vector header claims size==0 must raise
    (not SIGSEGV): cols.resize(base+0) then cols[base]=... would write past
    the vector end (ADVICE r2, native/codecs.cpp mvs_read_matrix_rows)."""
    from metagenome_vector_sketches_tpu.codecs import native
    if not native.available():
        pytest.skip("native codecs unavailable")
    # 24-byte header: size=0, width=1, num_words=0 — passes every bounds
    # check except the new size==0 rejection
    blob = (np.array([0, 1, 0], dtype="<u8")).tobytes()
    with pytest.raises(ValueError):
        native.read_matrix_rows(blob, np.array([0], dtype=np.uint64),
                                np.array([0], dtype=np.uint64))


def test_streaming_stale_max_component_raises(tmp_path):
    """_compute_streaming must trust-but-verify the sidecar max component
    against the data actually staged, like the device-resident path
    (ADVICE r2, matrix/compute.py). A stale max_component.txt that survives
    an mtime tie would otherwise silently wrap the int8 limb decomposition
    and drop pairs with no error."""
    from metagenome_vector_sketches_tpu.matrix.compute import (
        compute_pairwise_shard)
    rng = np.random.default_rng(7)
    n, d = 24, 64
    V = rng.integers(-3000, 3001, size=(n, d)).astype(np.int32)
    db = DbFolder.write(str(tmp_path / "db"), [f"S{i}" for i in range(n)],
                        V, d)
    # fake a stale sidecar claiming a much smaller max (mtime kept >= bin's
    # so DbFolder.max_component trusts it)
    mc = os.path.join(db.path, "max_component.txt")
    with open(mc, "w") as f:
        f.write("5\n")
    vb = os.path.join(db.path, "vectors.bin")
    os.utime(mc, (os.path.getmtime(vb) + 5, os.path.getmtime(vb) + 5))
    with pytest.raises(ValueError, match="stale"):
        # tiny budget forces the streaming path
        compute_pairwise_shard(db.path, str(tmp_path / "m"), tile_rows=8,
                               device_budget_bytes=0, verbose=False)


def test_multi_chunk_staging_oracle_equal(tmp_path, monkeypatch):
    """Shrinking STAGE_CHUNK_BYTES forces the device-resident stager to
    build its int8 plane stack across several H2D chunks (the production
    path at N=1M); the decoded shard must still equal the float64 oracle."""
    from metagenome_vector_sketches_tpu.matrix import compute
    from metagenome_vector_sketches_tpu.matrix.reader import MatrixReader
    from metagenome_vector_sketches_tpu.matrix.writer import quantize_jaccard
    rng = np.random.default_rng(11)
    n, d, tile = 40, 64, 8
    V = rng.integers(-500, 501, size=(n, d)).astype(np.int32)
    db = DbFolder.write(str(tmp_path / "db"), [f"S{i}" for i in range(n)],
                        V, d)
    # chunk resolves to one tile (8 rows) -> 5 staging chunks for n=40
    monkeypatch.setattr(compute, "STAGE_CHUNK_BYTES", 1024)
    compute.clear_device_cache()
    out = str(tmp_path / "m")
    compute.compute_pairwise_shard(db.path, out, tile_rows=tile,
                                   verbose=False)
    _, norms = db.names_and_norms()
    ns = norms * norms
    er, ec, ev = compute.compute_pairwise_oracle(V, ns, d, "int32")
    eq = quantize_jaccard(ev, er, ec, ns, d)
    rr, cc, qq = MatrixReader(out).decode_all_triples(n)
    assert set(zip(rr.tolist(), cc.tolist(), qq.tolist())) == \
        set(zip(er.tolist(), ec.tolist(), eq.tolist()))
    compute.clear_device_cache()


def test_device_resident_stale_max_component_raises(tmp_path):
    """Same guard on the device-resident path (regression pin for the
    round-2 check at matrix/compute._stage_database)."""
    from metagenome_vector_sketches_tpu.matrix.compute import (
        compute_pairwise_shard, clear_device_cache)
    rng = np.random.default_rng(8)
    n, d = 16, 32
    V = rng.integers(-3000, 3001, size=(n, d)).astype(np.int32)
    db = DbFolder.write(str(tmp_path / "db"), [f"S{i}" for i in range(n)],
                        V, d)
    mc = os.path.join(db.path, "max_component.txt")
    with open(mc, "w") as f:
        f.write("5\n")
    vb = os.path.join(db.path, "vectors.bin")
    os.utime(mc, (os.path.getmtime(vb) + 5, os.path.getmtime(vb) + 5))
    clear_device_cache()
    with pytest.raises(ValueError, match="stale"):
        compute_pairwise_shard(db.path, str(tmp_path / "m"), tile_rows=8,
                               verbose=False)


def test_distributed_int_selector_passthrough():
    """The mesh pool must honor the index's selector: 'partial'
    (approx_max_k at recall_target=1.0 — mathematically exact) has to
    give identical results to 'topk' through the sharded path, proving
    the attribute actually reaches _int_scan_pool (it was silently
    dropped before the round-3 review fix)."""
    import jax
    import numpy as np
    import pytest
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from metagenome_vector_sketches_tpu.ann.int_index import IntExactIndex
    from metagenome_vector_sketches_tpu.ann.distributed import (
        DistributedIntExactIndex)
    from metagenome_vector_sketches_tpu.parallel.mesh import make_mesh
    rng = np.random.default_rng(43)
    V = rng.integers(-500, 501, size=(120, 64)).astype(np.int32)
    Q = rng.integers(-500, 501, size=(3, 64)).astype(np.int32)
    mesh = make_mesh(8)
    a = IntExactIndex(V, chunk_rows=16)
    b = IntExactIndex(V, chunk_rows=16)
    b.selector = "partial"
    da = DistributedIntExactIndex.from_index(a, mesh=mesh)
    db = DistributedIntExactIndex.from_index(b, mesh=mesh)
    assert db.selector == "partial"
    Da, Ia = da.search(Q, 9)
    Db, Ib = db.search(Q, 9)
    assert np.array_equal(Ia, Ib) and np.array_equal(Da, Db)


@pytest.mark.parametrize("fmt", ["prev", "ef", "rice", "sorted"])
def test_legacy_readers_reject_corrupt_files_cleanly(tmp_path, fmt):
    """Corrupted/truncated legacy artifacts must raise ordinary exceptions
    — never hang, crash, or size an allocation from a corrupt header
    (companion to the native-codec hardening; fuzzed 225 corruptions
    clean, this pins a representative sample)."""
    from metagenome_vector_sketches_tpu.matrix import legacy
    rng = np.random.default_rng(47)
    n = 6
    rows = np.repeat(np.arange(n), 5)
    cols = np.tile(np.sort(rng.choice(50, size=5, replace=False)), n)
    vals = rng.integers(1, 10**6, size=len(rows))
    d = 256
    folder = str(tmp_path / fmt)
    if fmt == "prev":
        legacy.write_legacy_prev(folder, rows, cols, vals, d)
        read = legacy.read_legacy_prev
    elif fmt == "ef":
        legacy.write_legacy_ef(folder, rows, cols, vals, d)
        read = legacy.read_legacy_ef
    elif fmt == "rice":
        legacy.write_legacy_rice(folder, rows, cols, vals, d)
        read = legacy.read_legacy_rice
    else:
        norms_sq = rng.uniform(500, 5000, size=50)
        legacy.write_legacy_sorted(folder, rows, cols, vals, norms_sq, d)
        read = legacy.read_legacy_sorted
    read(folder)                                   # sanity: reads clean
    for fname in sorted(os.listdir(folder)):
        path = os.path.join(folder, fname)
        if not os.path.isfile(path):
            continue
        data = open(path, "rb").read()
        for mut in range(6):
            bb = bytearray(data)
            if not bb:
                continue
            if mut % 2 == 0:
                bb = bb[:int(rng.integers(0, len(bb)))]
            else:
                for _ in range(int(rng.integers(1, 4))):
                    bb[int(rng.integers(0, len(bb)))] = \
                        int(rng.integers(0, 256))
            with open(path, "wb") as f:
                f.write(bytes(bb))
            try:
                read(folder)     # corrupt data may decode to garbage...
            except MemoryError:
                raise AssertionError(
                    f"unbounded allocation from corrupt {fmt}/{fname}")
            except Exception:
                pass             # ...but must fail ORDINARILY if it fails
            with open(path, "wb") as f:
                f.write(data)


def test_query_ava_matrix_reference_flag_surface(tmp_path, capsys,
                                                 monkeypatch):
    """The legacy CLI accepts the REFERENCE's flag surface
    (query_ava_matrix.cpp:481-489): --matrix_folder, --stdin, and norms
    loaded from the matrix folder itself when no --db is given (the
    reference's load_vector_identifiers reads vector_norms.txt out of
    matrix_folder, :529-532)."""
    import io as _io
    from metagenome_vector_sketches_tpu.matrix import legacy
    from metagenome_vector_sketches_tpu.cli.query_ava_matrix import main

    rng = np.random.default_rng(7)
    n, d = 8, 32
    V = rng.integers(-40, 41, size=(n, d)).astype(np.int32)
    db = DbFolder.write(str(tmp_path / "db"), [f"S{i}" for i in range(n)],
                        V, d)
    rows = np.repeat(np.arange(n), 2)
    cols = np.tile(np.array([0, 1]), n)
    vals = np.abs(V[rows] @ np.ones(d, dtype=np.int64)) + d
    mdir = str(tmp_path / "m")
    legacy.write_legacy_prev(mdir, rows, cols, vals, d)
    # reference layout: vector_norms.txt lives in the matrix folder
    import shutil
    shutil.copy(os.path.join(db.path, "vector_norms.txt"),
                os.path.join(mdir, "vector_norms.txt"))

    rc = main(["--matrix_folder", mdir, "--query_ids", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert f"Total vectors loaded: {n}" in out and "Query: 3" in out

    monkeypatch.setattr("sys.stdin", _io.StringIO("S2\n5\n"))
    rc = main(["--matrix_folder", mdir, "--stdin"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Query: 2" in out and "Query: 5" in out


def test_last_stages_reset_on_skipped_and_empty_shards(tmp_path):
    """A multi-shard loop reading LAST_STAGES after a resume-skipped or
    empty shard must see zeros, not the previous shard's timings."""
    from metagenome_vector_sketches_tpu.matrix import compute as mc
    rng = np.random.default_rng(17)
    V = rng.integers(-50, 51, size=(4, 16)).astype(np.int32)
    db = DbFolder.write(str(tmp_path / "db"), [f"S{i}" for i in range(4)],
                        V, 16)
    out = str(tmp_path / "m")
    mc.compute_pairwise_shard(db.path, out, num_shards=8, shard_idx=0,
                              tile_rows=8, verbose=False)
    assert mc.LAST_STAGES["pairs_written"] >= 1  # shard 0 = row 0 only
    # resume-skip: stages must reset to zeros
    mc.compute_pairwise_shard(db.path, out, num_shards=8, shard_idx=0,
                              tile_rows=8, verbose=False, resume=True)
    assert mc.LAST_STAGES["pairs_written"] == 0
    assert mc.LAST_STAGES["total_ms"] == 0 if "total_ms" in mc.LAST_STAGES \
        else True
    # shard beyond the row space (empty): also zeros
    mc.compute_pairwise_shard(db.path, out, num_shards=8, shard_idx=7,
                              tile_rows=8, verbose=False)
    assert mc.LAST_STAGES["pairs_written"] == 0
