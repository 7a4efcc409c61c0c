"""Conformance gates for the ingest slice (SURVEY.md §7.3 step 2): hashes,
vectors.bin, and vector_norms.txt must match the reference outputs on toy.

The reference orders accessions by directory-iteration order while we sort
lexicographically, so comparisons are keyed per accession, and the byte
content per row is required to be identical.
"""

import numpy as np
import pytest

from metagenome_vector_sketches_tpu.io.hashes import parse_hashes_file
from metagenome_vector_sketches_tpu.io import sigzip
from metagenome_vector_sketches_tpu.io.dbfolder import DbFolder, compute_norms, cap_int16
from metagenome_vector_sketches_tpu.ops.projection import project_host


@pytest.fixture(scope="module")
def ref_hashes(ref_toy_dir):
    return dict(parse_hashes_file(str(ref_toy_dir / "all_hashes_toy.txt")))


def test_sigzip_matches_reference_hashes(toy_sig_dir, ref_hashes):
    files = list(sigzip.iter_signature_files(str(toy_sig_dir)))
    assert len(files) == 61
    for path in files[:8]:
        name = sigzip.accession_name(path)
        ours = sigzip.read_sig_zip(path)
        assert name in ref_hashes
        theirs = set(int(h) for h in ref_hashes[name])
        assert ours == theirs, f"hash set mismatch for {name}"


def test_sigzip_native_equals_python_all_toys(toy_sig_dir):
    """The C++ scanner (native/sigscan.cpp) must return the same hash set as
    the zipfile/gzip/json path on EVERY toy accession (and at a non-default
    ksize)."""
    if sigzip._load_native() is None:
        pytest.skip("native sigscan unavailable")
    files = list(sigzip.iter_signature_files(str(toy_sig_dir)))
    for path in files:
        got = sigzip._read_sig_zip_native(path, 31)
        assert got is not None, f"native scan refused {path}"
        assert got == sigzip._read_sig_zip_python(path, 31), path
    # other ksizes present in the fixtures
    assert (sigzip._read_sig_zip_native(files[0], 15)
            == sigzip._read_sig_zip_python(files[0], 15) != set())
    # absent ksize -> empty
    assert sigzip._read_sig_zip_native(files[0], 21) == set()


def test_sigzip_native_stored_and_whitespace(tmp_path):
    """The C++ scanner must handle STORED zip members and JSON with \\r\\n /
    tab whitespace (and agree with the python path on both)."""
    import gzip
    import json
    import zipfile
    if sigzip._load_native() is None:
        pytest.skip("native sigscan unavailable")
    sig = [{"class": "sourmash_signature",
            "signatures": [{"num": 0, "ksize": 31, "seed": 42,
                            "mins": [12345678901234567890, 42, 7]}]}]
    pretty = json.dumps(sig, indent=1).replace("\n", "\r\n").replace(" ", "\t")
    for method, text in [(zipfile.ZIP_STORED, json.dumps(sig)),
                         (zipfile.ZIP_DEFLATED, pretty)]:
        path = str(tmp_path / f"ACC{method}.x.sig.zip")
        with zipfile.ZipFile(path, "w", compression=method) as zf:
            zf.writestr("signatures/a.sig.gz", gzip.compress(text.encode()))
        want = {12345678901234567890, 42, 7}
        assert sigzip._read_sig_zip_python(path, 31) == want
        got = sigzip._read_sig_zip_native(path, 31)
        # a structural refusal (None -> python fallback) is acceptable;
        # a WRONG answer is not
        assert got is None or got == want
        assert sigzip.read_sig_zip(path, 31) == want


def test_sigzip_native_hostile_inputs(tmp_path):
    """Confirmed-repro regressions: mins-before-ksize key order must not be
    silently mis-read, and a corrupt gzip ISIZE trailer must not abort the
    process — both must fall back (or agree with) the python path."""
    import gzip
    import zipfile
    if sigzip._load_native() is None:
        pytest.skip("native sigscan unavailable")
    # (a) mins precedes ksize in the record
    a = str(tmp_path / "A.x.sig.zip")
    with zipfile.ZipFile(a, "w") as zf:
        zf.writestr("signatures/a.sig.gz", gzip.compress(
            b'[{"signatures":[{"mins":[1,2,3],"ksize":31}]}]'))
    assert sigzip.read_sig_zip(a, 31) == {1, 2, 3}
    # (b) mins of a ksize=31 record follows a minsless ksize=21 record
    b = str(tmp_path / "B.x.sig.zip")
    with zipfile.ZipFile(b, "w") as zf:
        zf.writestr("signatures/b.sig.gz", gzip.compress(
            b'[{"signatures":[{"ksize":21},{"mins":[7,8],"ksize":31}]}]'))
    assert sigzip.read_sig_zip(b, 31) == {7, 8}
    # (c) corrupt gzip ISIZE trailer (0xFFFFFFFF): no abort, python fallback
    payload = bytearray(gzip.compress(
        b'[{"signatures":[{"ksize":31,"mins":[5]}]}]'))
    payload[-4:] = b"\xff\xff\xff\xff"
    c = str(tmp_path / "C.x.sig.zip")
    with zipfile.ZipFile(c, "w") as zf:
        zf.writestr("signatures/c.sig.gz", bytes(payload))
    # python's gzip may raise on the trailer mismatch — either way the
    # call must not crash the process, and a SUCCESSFUL read must return
    # the true set (the old blanket `except` swallowed the assert too)
    try:
        got = sigzip.read_sig_zip(c, 31)
    except (OSError, ValueError, EOFError):
        got = None
    assert got is None or got == {5}


@pytest.mark.parametrize("db,dtype,d", [
    ("toy_db_2048", "int32", 2048),
    ("toy_db_2048_i16", "int16", 2048),
    ("toy_db_256", "int32", 256),
])
def test_vectors_and_norms_bit_match(ref_toy_dir, ref_hashes, db, dtype, d):
    ref_db = DbFolder(str(ref_toy_dir / db))
    assert ref_db.dimension == d
    assert ref_db.dtype == dtype
    ref_names, _ = ref_db.names_and_norms()
    ref_vecs = ref_db.load_vectors()

    with open(str(ref_toy_dir / db / "vector_norms.txt")) as f:
        ref_norm_strs = {ln.split()[0]: ln.split()[1] for ln in f if ln.strip()}

    # project a subset (full 61 x 2048 host projection is slow in pure numpy
    # only for the big dims; 61 sets is fine)
    idx = {n: i for i, n in enumerate(ref_names)}
    take = ref_names[::7]  # 9 accessions spread over the db
    for name in take:
        ours32 = project_host(np.asarray(ref_hashes[name], dtype=np.uint64), d)
        want = ref_vecs[idx[name]]
        if dtype == "int16":
            np.testing.assert_array_equal(cap_int16(ours32[None])[0], want)
        else:
            np.testing.assert_array_equal(ours32, want)
        norm = compute_norms(ours32[None].astype(np.int32), d)[0]
        assert f"{float(norm):.6g}" == ref_norm_strs[name], name


def test_full_db_write_round_trip(tmp_path, ref_toy_dir, ref_hashes):
    """End-to-end: project all 61 accessions at d=256 on the jax device path
    and require byte-identical per-accession rows + identical norm strings."""
    from metagenome_vector_sketches_tpu.ops.projection import project_device_many

    ref_db = DbFolder(str(ref_toy_dir / "toy_db_256"))
    ref_names, _ = ref_db.names_and_norms()
    ref_vecs = ref_db.load_vectors()
    names = sorted(ref_hashes.keys())
    vecs = project_device_many([ref_hashes[n] for n in names], 256)
    out = DbFolder.write(str(tmp_path / "db"), names, vecs, 256)

    got_names, _ = out.names_and_norms()
    got_vecs = out.load_vectors()
    ref_index = {n: i for i, n in enumerate(ref_names)}
    for i, n in enumerate(got_names):
        np.testing.assert_array_equal(got_vecs[i], ref_vecs[ref_index[n]])

    with open(str(ref_toy_dir / "toy_db_256/vector_norms.txt")) as f:
        ref_norm_strs = {ln.split()[0]: ln.split()[1] for ln in f if ln.strip()}
    with open(str(tmp_path / "db/vector_norms.txt")) as f:
        got_norm_strs = {ln.split()[0]: ln.split()[1] for ln in f if ln.strip()}
    assert got_norm_strs == ref_norm_strs
