"""Round-3 review hardening across the IO/codec/reader layer: dotfile
ingest, db-folder write guards, minhash edge cases, quantizer clamp,
codec corrupt-header caps, reader error contracts."""

import os

import numpy as np
import pytest

from metagenome_vector_sketches_tpu.io.dbfolder import DbFolder
from metagenome_vector_sketches_tpu.io.ingest import convert
from metagenome_vector_sketches_tpu.matrix.writer import quantize_jaccard
from metagenome_vector_sketches_tpu.codecs import pyref


def test_convert_skips_dotfiles(tmp_path):
    """A .DS_Store yields an EMPTY accession name (stem up to first '.') —
    its line could not round-trip through vector_norms.txt, silently
    misaligning every later accession; convert must skip it."""
    folder = tmp_path / "sigs"
    folder.mkdir()
    (folder / ".DS_Store").write_bytes(b"\x00junk")
    (folder / "GOOD.sig.zip").write_bytes(b"not a zip either")
    results = convert(str(folder), str(tmp_path / "ah.txt"), verbose=False)
    names = [n for n, _ in results]
    assert names == ["GOOD"]


def test_dbfolder_write_rejects_misaligned_names(tmp_path):
    V = np.ones((3, 8), dtype=np.int32)
    with pytest.raises(ValueError, match="misaligned"):
        DbFolder.write(str(tmp_path / "db"), ["A", "B"], V, 8)


def test_dbfolder_write_rejects_empty_or_spacey_names(tmp_path):
    V = np.ones((2, 8), dtype=np.int32)
    with pytest.raises(ValueError, match="accession names"):
        DbFolder.write(str(tmp_path / "db1"), ["", "B"], V, 8)
    with pytest.raises(ValueError, match="accession names"):
        DbFolder.write(str(tmp_path / "db2"), ["A B", "C"], V, 8)


def test_minhash_all_empty_sets():
    """Every signature failing to parse must yield the zero matrix, not a
    concatenate crash."""
    from metagenome_vector_sketches_tpu.ops import minhash
    out = minhash.pairwise_intersections([set(), set()])
    assert out.shape == (2, 2) and not out.any()
    jac, sizes = minhash.pairwise_jaccard_minhash([set(), set()])
    assert not jac.any() and not sizes.any()


def test_minhash_windowed_chunks_match_bruteforce():
    rng = np.random.default_rng(5)
    sets = [set(int(x) for x in rng.integers(0, 1 << 40, size=rng.integers(0, 200)))
            for _ in range(6)]
    from metagenome_vector_sketches_tpu.ops import minhash
    got = minhash.pairwise_intersections(sets, chunk=64)
    want = np.array([[len(a & b) for b in sets] for a in sets],
                    dtype=np.int64)
    np.testing.assert_array_equal(got, want)


def test_quantize_jaccard_clamps_negative_and_degenerate():
    """A noisy estimate can push dot/d past |A|+|B| (negative jac) — the
    uint16 cast of a negative float is undefined at the C level; clamp."""
    # dot/d = 120 > 0.4 = na+nb -> negative denominator
    q = quantize_jaccard(np.array([120], dtype=np.int64),
                         np.array([0]), np.array([1]),
                         np.array([0.2, 0.2]), 1)
    assert q[0] == 0
    # inter == na+nb exactly -> division by zero -> clamp to 1
    q = quantize_jaccard(np.array([4], dtype=np.int64),
                         np.array([0]), np.array([1]),
                         np.array([2.0, 2.0]), 1)
    assert q[0] == 255
    # ordinary value unchanged: J = 1/(2+2-1) = 1/3 -> round(85.0) = 85
    q = quantize_jaccard(np.array([1], dtype=np.int64),
                         np.array([0]), np.array([1]),
                         np.array([2.0, 2.0]), 1)
    assert q[0] == 85


def test_pyref_cv_width_aware_cap():
    """A crafted size inside the old width-blind '+64' slack must raise the
    designed ValueError, not IndexError deep in unpack_fixed."""
    blob = np.array([4 * 64 + 64, 8, 4, 0, 0, 0, 0], dtype="<u8").tobytes()
    with pytest.raises(ValueError, match="corrupt"):
        pyref.cv_decode(blob)


def test_pyref_rice_param_aware_cap_and_terminators():
    # n*(1+l) exceeds the bit budget
    blob = np.array([100, 7, 2, 0, 0], dtype="<u8").tobytes()
    with pytest.raises(ValueError, match="corrupt"):
        pyref.rice_decode(blob)
    # header fine, but all-ones words carry no terminators
    blob = np.array([3, 0, 1, 0xFFFFFFFFFFFFFFFF], dtype="<u8").tobytes()
    with pytest.raises(ValueError, match="corrupt"):
        pyref.rice_decode(blob)


def test_pyref_roundtrip_still_clean():
    rng = np.random.default_rng(9)
    vals = rng.integers(0, 1 << 30, size=257).astype(np.uint64)
    dec, _ = pyref.cv_decode(pyref.cv_encode(vals))
    np.testing.assert_array_equal(dec, vals)
    dec, _ = pyref.rice_decode(pyref.rice_encode(vals))
    np.testing.assert_array_equal(dec, vals)
    for empty in (pyref.cv_decode(pyref.cv_encode(np.empty(0, np.uint64))),
                  pyref.rice_decode(pyref.rice_encode(np.empty(0, np.uint64)))):
        assert len(empty[0]) == 0


def test_reader_no_shards_clean_error(tmp_path):
    from metagenome_vector_sketches_tpu.matrix.reader import MatrixReader
    empty = tmp_path / "not_a_matrix"
    empty.mkdir()
    r = MatrixReader(str(empty))
    assert r.num_shards == 0
    with pytest.raises(FileNotFoundError, match="shard"):
        r.load_neighbors_for_rows([0], 10)
    # the conformance view of an empty folder stays empty, not an error
    rr, cc, qq = r.decode_all_triples(10)
    assert len(rr) == len(cc) == len(qq) == 0


def test_decode_row_python_path_zero_size_row(tmp_path):
    """The per-row python fallback must reject a size-0 row like the
    hardened native batched decoder (ValueError, not IndexError)."""
    from metagenome_vector_sketches_tpu.matrix import reader as mr
    from metagenome_vector_sketches_tpu import codecs
    shard = tmp_path / "shard_0"
    shard.mkdir()
    # row_index: rows=[7], deltas=[] ; matrix.bin: one size-0 cv blob
    (shard / "row_index.bin").write_bytes(
        codecs.cv_encode(np.array([7], dtype=np.uint64))
        + codecs.cv_encode(np.empty(0, dtype=np.uint64)))
    (shard / "neighbor_start.bin").write_bytes(
        codecs.rice_encode(np.array([7], dtype=np.uint64)))
    (shard / "matrix.bin").write_bytes(
        codecs.cv_encode(np.empty(0, dtype=np.uint64)))
    sr = mr.ShardReader(str(shard))
    with pytest.raises(ValueError, match="zero-size"):
        sr.decode_row(7)


def test_dbfolder_names_cache_invalidated_on_rewrite(tmp_path):
    V = np.arange(16, dtype=np.int32).reshape(2, 8)
    db = DbFolder.write(str(tmp_path / "db"), ["A", "B"], V, 8)
    names1, norms1 = db.names_and_norms()
    assert names1 == ["A", "B"]
    # mutate the returned copy: the cache must not be poisoned
    norms1[:] = -1
    names2, norms2 = db.names_and_norms()
    assert (norms2 >= 0).all()
    # rewrite invalidates (fresh mtime/size key)
    os.utime(os.path.join(db.path, "vector_norms.txt"), ns=(1, 1))
    with open(os.path.join(db.path, "vector_norms.txt"), "w") as f:
        f.write("C 1.0\n")
    names3, _ = db.names_and_norms()
    assert names3 == ["C"]


def test_native_hashes_parser_equivalence(tmp_path):
    """hashparse_read (native/sigscan.cpp) must produce exactly the Python
    parser's output — names verbatim, per-line sorted-unique u64 arrays,
    colon-less lines skipped — and fall back (None) on malformed tokens."""
    import numpy as np
    from metagenome_vector_sketches_tpu.io import hashes as H
    p = tmp_path / "h.txt"
    p.write_text("acc one: 5 3 3 18446744073709551615 0\n"
                 "no colon line\n"
                 "empty:\n"
                 "ws:   7   8  \n"
                 "crlf: 9 10\r\n")
    nat = H._parse_hashes_native(str(p))
    if nat is None:
        import pytest
        pytest.skip("native lib unavailable")
    pure = []
    with open(p) as f:
        for line in f:
            colon = line.find(":")
            if colon < 0:
                continue
            rest = line[colon + 1:].split()
            pure.append((line[:colon],
                         np.unique(np.array(rest, dtype=np.uint64)) if rest
                         else np.empty(0, dtype=np.uint64)))
    assert len(nat) == len(pure) == 4
    for (n1, a1), (n2, a2) in zip(nat, pure):
        assert n1 == n2
        assert np.array_equal(a1, a2)
    p.write_text("bad: 12x3\n")
    assert H._parse_hashes_native(str(p)) is None


def test_native_hashes_parser_overflow_above_v(tmp_path):
    """u64 wraps that land ABOVE the running value (the (nv < v)-blind
    class, r5 review: '46116860184273879040' wraps to 2^63 > 2^62) must
    error out to the Python fallback, not store a corrupt hash."""
    from metagenome_vector_sketches_tpu.io import hashes as H
    p = tmp_path / "h.txt"
    p.write_text("x: 46116860184273879040\n")
    assert H._parse_hashes_native(str(p)) is None
    p.write_text("x: 18446744073709551615\n")     # UINT64_MAX parses
    r = H._parse_hashes_native(str(p))
    if r is not None:
        assert r[0][1].tolist() == [2**64 - 1]
