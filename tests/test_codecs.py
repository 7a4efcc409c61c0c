import numpy as np
import pytest

from metagenome_vector_sketches_tpu.codecs import pyref

try:
    from metagenome_vector_sketches_tpu.codecs import native
    HAVE_NATIVE = native.available()
except Exception:
    HAVE_NATIVE = False

CASES = [
    np.array([], dtype=np.uint64),
    np.array([0], dtype=np.uint64),
    np.array([0, 0, 0], dtype=np.uint64),
    np.array([1, 2, 3, 200, 255], dtype=np.uint64),
    np.array([2**63, 1, 2**64 - 1, 0], dtype=np.uint64),
    np.arange(1000, dtype=np.uint64) * 37,
]


def _rng_cases():
    rng = np.random.default_rng(3)
    yield rng.integers(0, 256, size=5000).astype(np.uint64)
    yield rng.integers(0, 2**40, size=500).astype(np.uint64)
    yield np.concatenate([rng.integers(0, 8, size=1000),
                          [2**50]]).astype(np.uint64)  # outlier forces big param


@pytest.mark.parametrize("codec", ["cv", "rice"])
def test_pyref_round_trip(codec):
    enc = getattr(pyref, f"{codec}_encode")
    dec = getattr(pyref, f"{codec}_decode")
    for vals in list(CASES) + list(_rng_cases()):
        blob = enc(vals)
        got, consumed = dec(blob)
        assert consumed == len(blob)
        np.testing.assert_array_equal(got, vals)


def test_pyref_ef_round_trip():
    rng = np.random.default_rng(4)
    for vals in [np.array([], dtype=np.uint64),
                 np.array([0], dtype=np.uint64),
                 np.array([5], dtype=np.uint64),
                 np.sort(rng.choice(10**6, size=500, replace=False)).astype(np.uint64),
                 np.arange(100, dtype=np.uint64),
                 np.array([0, 0, 3, 3, 7], dtype=np.uint64)]:  # duplicates allowed
        universe = int(vals[-1]) + 1 if len(vals) else 1
        blob = pyref.ef_encode(vals, universe)
        got, consumed = pyref.ef_decode(blob)
        assert consumed == len(blob)
        np.testing.assert_array_equal(got, vals)


@pytest.mark.skipif(not HAVE_NATIVE, reason="native codecs unavailable")
def test_native_matches_pyref_bytes():
    rng = np.random.default_rng(5)
    for vals in list(CASES) + list(_rng_cases()):
        assert native.cv_encode(vals) == pyref.cv_encode(vals)
        assert native.rice_encode(vals) == pyref.rice_encode(vals)
    for _ in range(5):
        vals = np.sort(rng.choice(10**7, size=300, replace=False)).astype(np.uint64)
        u = int(vals[-1]) + 1
        assert native.ef_encode(vals, u) == pyref.ef_encode(vals, u)


@pytest.mark.skipif(not HAVE_NATIVE, reason="native codecs unavailable")
def test_native_round_trip_and_offsets():
    rng = np.random.default_rng(6)
    a = rng.integers(0, 255, size=321).astype(np.uint64)
    b = rng.integers(0, 2**33, size=77).astype(np.uint64)
    blob = native.cv_encode(a) + native.rice_encode(b)
    got_a, c1 = native.cv_decode(blob, 0)
    got_b, c2 = native.rice_decode(blob, c1)
    assert c1 + c2 == len(blob)
    np.testing.assert_array_equal(got_a, a)
    np.testing.assert_array_equal(got_b, b)
    # cross-impl decode
    got_a2, _ = pyref.cv_decode(blob, 0)
    np.testing.assert_array_equal(got_a2, a)


@pytest.mark.skipif(not HAVE_NATIVE, reason="native codecs unavailable")
def test_native_truncated_buffer_errors():
    blob = native.rice_encode(np.arange(100, dtype=np.uint64))
    with pytest.raises(ValueError):
        native.rice_decode(blob[:10], 0)


def test_batched_matrix_rows_byte_identical():
    """mvs_write_matrix_rows (one native call per shard) must be
    byte-identical with the per-row cv+rice loop, including positions and
    first-neighbor columns; ascending-column violations are refused."""
    if not HAVE_NATIVE:
        pytest.skip("native codecs unavailable")
    rng = np.random.default_rng(5)
    cols_all, q_all, starts = [], [], [0]
    for r in range(80):
        n = int(rng.integers(1, 40))
        c = np.sort(rng.choice(100000, size=n, replace=False)).astype(np.uint64)
        cols_all.append(c)
        q_all.append(rng.integers(0, 256, size=n).astype(np.uint64))
        starts.append(starts[-1] + n)
    cols = np.concatenate(cols_all)
    q = np.concatenate(q_all)
    starts = np.asarray(starts, dtype=np.uint64)
    blob, pos, first = native.write_matrix_rows(cols, q, starts)
    want = b""
    wpos, wfirst = [], []
    for k in range(len(starts) - 1):
        s, e = int(starts[k]), int(starts[k + 1])
        wpos.append(len(want))
        wfirst.append(cols[s])
        want += native.cv_encode(q[s:e])
        if e - s > 1:
            want += native.rice_encode(np.diff(cols[s:e]).astype(np.uint64))
    assert blob == want
    np.testing.assert_array_equal(pos, np.asarray(wpos, dtype=np.uint64))
    np.testing.assert_array_equal(first, np.asarray(wfirst, dtype=np.uint64))
    bad = cols.copy()
    bad[1] = bad[0]  # duplicate column within row 0
    with pytest.raises(ValueError):
        native.write_matrix_rows(bad, q, starts)


def test_codec_fuzz_native_eq_pyref_and_clean_corrupt_errors():
    """Randomized cross-validation of the three codecs: native and python
    encoders must produce BYTE-IDENTICAL buffers (the on-disk contract),
    decoders must round-trip, and truncated buffers must raise in BOTH
    decoders (never crash or silently return)."""
    if not HAVE_NATIVE:
        pytest.skip("native codecs unavailable")
    rng = np.random.default_rng(41)
    for trial in range(60):
        k = int(rng.integers(0, 60))
        uni = int(rng.integers(max(2, k + 1), 100000))
        vals = np.sort(rng.choice(uni, size=k, replace=False)
                       ).astype(np.uint64)
        free = rng.integers(0, 1 << int(rng.integers(1, 32)),
                            size=k).astype(np.uint64)
        cases = [(pyref.cv_encode, pyref.cv_decode, native.cv_encode,
                  native.cv_decode, (free,)),
                 (pyref.rice_encode, pyref.rice_decode, native.rice_encode,
                  native.rice_decode, (free,)),
                 (pyref.ef_encode, pyref.ef_decode, native.ef_encode,
                  native.ef_decode, (vals, uni))]
        for enc_p, dec_p, enc_n, dec_n, args in cases:
            try:
                bp = enc_p(*args)
            except Exception:
                continue            # e.g. empty EF input rejected
            bn = enc_n(*args)
            assert bp == bn, (trial, enc_p.__name__)
            vp, _ = dec_p(bp)
            vn, _ = dec_n(bn)
            assert np.array_equal(np.asarray(vp), np.asarray(vn))
            assert np.array_equal(np.asarray(vp), args[0])
            for cut in {1, len(bp) // 2, max(0, len(bp) - 3)}:
                for dec in (dec_p, dec_n):
                    with pytest.raises(Exception):
                        dec(bp[:cut])


def test_corrupt_headers_cannot_drive_huge_allocations():
    """A corrupted size/count header must be rejected from the bits
    actually present in the buffer — BEFORE any allocation sized from the
    header (an ASAN fuzz found a corrupt Elias-Fano size field requesting
    a multi-TB malloc in the native decoder; the numpy decoders could be
    driven into unbounded np allocations the same way)."""
    vals = np.arange(1, 30, dtype=np.uint64) * 7
    huge = (1 << 60).to_bytes(8, "little")
    for enc, decs, args in (
            (pyref.cv_encode, [pyref.cv_decode], (vals,)),
            (pyref.rice_encode, [pyref.rice_decode], (vals,)),
            (pyref.ef_encode, [pyref.ef_decode], (vals, 300))):
        if HAVE_NATIVE:
            decs = decs + [getattr(native, decs[0].__name__)]
        blob = bytearray(enc(*args))
        blob[0:8] = huge                       # corrupt the size field
        for dec in decs:
            with pytest.raises(Exception):
                dec(bytes(blob))
    # EF with fewer set high bits than elements must raise, not return
    # uninitialized memory
    blob = bytearray(pyref.ef_encode(vals, 300))
    n = int(np.frombuffer(bytes(blob[:8]), dtype="<u8")[0])
    blob[0:8] = (n + 1).to_bytes(8, "little")
    for dec in ([pyref.ef_decode, native.ef_decode] if HAVE_NATIVE
                else [pyref.ef_decode]):
        with pytest.raises(Exception):
            dec(bytes(blob))
