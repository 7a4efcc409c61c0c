"""jermp/bits-layout compat codecs (VERDICT r1 item 6, the declared stretch
goal): reconstructed serialization of bits::compact_vector /
rice_sequence<> / elias_fano<>, byte-level hand fixtures, and the shard
reader's layout autodetect."""

import struct

import numpy as np
import pytest

from metagenome_vector_sketches_tpu.codecs import bitscompat as bc


# ---------------------------------------------------------------------------
# hand-constructed byte fixtures (layout spec, not inverse-of-encode)
# ---------------------------------------------------------------------------

def test_cv_hand_fixture():
    # compact_vector of [5, 0, 7, 3] at width 3:
    # values LSB-first: 5 | 0<<3 | 7<<6 | 3<<9 = 5 + 448 + 1536 = 0x7C5
    blob = struct.pack("<QQQQQ", 4, 3, 0b111, 1, 0x7C5)
    vals, consumed, width = bc.cv_decode(blob)
    assert consumed == len(blob) and width == 3
    np.testing.assert_array_equal(vals, [5, 0, 7, 3])


def test_cv_hand_fixture_padded_words():
    # a real library may over-allocate words; the vector length is in the
    # stream, so decode must tolerate padding
    blob = struct.pack("<QQQQQQ", 4, 3, 0b111, 2, 0x7C5, 0)
    vals, consumed, _ = bc.cv_decode(blob)
    assert consumed == len(blob)
    np.testing.assert_array_equal(vals, [5, 0, 7, 3])


def test_rice_hand_fixture():
    # rice of [2, 9] at l=2: q = [0, 2]; high bits = 1, 001 -> bits 1001
    # (ones at positions 0 and 3), lows = [2, 1] at width 2 -> 0b0110
    high = struct.pack("<QQQ", 4, 1, 0b1001)             # bit_vector
    darr = struct.pack("<QQqQQQQ", 2, 1, 0, 1, 0, 1, 0)
    # ^ m_positions=2, block_inv=[0], sub_inv=[0] (u16 count=1... see below)
    darr = struct.pack("<Q", 2)                           # m_positions
    darr += struct.pack("<Qq", 1, 0)                      # block_inventory
    darr += struct.pack("<Q", 1) + struct.pack("<H", 0)   # subblock (u16)
    darr += struct.pack("<Q", 0)                          # overflow
    low = struct.pack("<QQQQQ", 2, 2, 0b11, 1, 0b0110)    # compact_vector
    vals, consumed = bc.rice_decode(high + darr + low)
    assert consumed == len(high + darr + low)
    np.testing.assert_array_equal(vals, [2, 9])


def test_ef_hand_fixture():
    # elias_fano of [1, 4, 7], universe 8, n=3 -> l = floor(log2(8/3)) = 1
    # highs = [0, 2, 3]; positions high+i = [0, 3, 5]; total bits 3+(8>>1)+1=8
    high_words = (1 << 0) | (1 << 3) | (1 << 5)
    ef = struct.pack("<Q", 8)                              # universe
    ef += struct.pack("<QQQ", 8, 1, high_words)            # bit_vector
    ef += struct.pack("<Q", 3)                             # darray positions
    ef += struct.pack("<Qq", 1, 0)
    ef += struct.pack("<Q", 1) + struct.pack("<H", 0)
    ef += struct.pack("<Q", 0)
    lows = 1 | (0 << 1) | (1 << 2)                         # low bits [1,0,1]
    ef += struct.pack("<QQQQQ", 3, 1, 1, 1, lows)
    vals, consumed = bc.ef_decode(ef)
    assert consumed == len(ef)
    np.testing.assert_array_equal(vals, [1, 4, 7])


# ---------------------------------------------------------------------------
# round trips incl. darray overflow blocks
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("maker", [
    lambda rng: rng.integers(0, 1 << 8, size=500).astype(np.uint64),
    lambda rng: rng.integers(0, 1 << 40, size=3000).astype(np.uint64),
    lambda rng: np.zeros(10, dtype=np.uint64),
    lambda rng: np.array([0], dtype=np.uint64),
    lambda rng: np.empty(0, dtype=np.uint64),
])
def test_cv_rice_round_trip(maker):
    rng = np.random.default_rng(12)
    v = maker(rng)
    got, consumed, _ = bc.cv_decode(bc.cv_encode(v))
    np.testing.assert_array_equal(got, v)
    got, consumed = bc.rice_decode(bc.rice_encode(v))
    np.testing.assert_array_equal(got, v)


def test_rice_sparse_overflow_block():
    """>1024 values whose unary ones span > 2^16 bits per block exercises
    the darray overflow arm of the encoder (decode skips it structurally)."""
    rng = np.random.default_rng(13)
    v = rng.integers(0, 1 << 10, size=2500).astype(np.uint64)
    v[::7] = 0
    # l=2 forces avg unary runs ~128 bits: each 1024-position darray block
    # spans > 2^16 bits -> the overflow arm
    got, _ = bc.rice_decode(bc.rice_encode(v, l=2))
    np.testing.assert_array_equal(got, v)


def test_ef_round_trip():
    rng = np.random.default_rng(14)
    for n, u in [(1, 10), (100, 10**6), (5000, 10**9), (64, 64)]:
        v = np.sort(rng.integers(0, u, size=n).astype(np.uint64))
        got, _ = bc.ef_decode(bc.ef_encode(v, u))
        np.testing.assert_array_equal(got, v)
    got, _ = bc.ef_decode(bc.ef_encode(np.empty(0, dtype=np.uint64), 100))
    assert len(got) == 0


# ---------------------------------------------------------------------------
# shard reader autodetect
# ---------------------------------------------------------------------------

def _write_both_layouts(tmp_path, n=30, d=64, seed=17):
    from metagenome_vector_sketches_tpu.io.dbfolder import DbFolder
    from metagenome_vector_sketches_tpu.matrix.compute import (
        compute_pairwise_oracle)
    from metagenome_vector_sketches_tpu.matrix.writer import write_shard
    rng = np.random.default_rng(seed)
    V = rng.integers(-200, 201, size=(n, d)).astype(np.int32)
    V[1] = V[0]
    db = DbFolder.write(str(tmp_path / "db"), [f"S{i}" for i in range(n)],
                        V, d)
    _, norms = db.names_and_norms()
    ns = norms * norms
    r, c, v = compute_pairwise_oracle(V, ns, d)
    write_shard(str(tmp_path / "native" / "shard_0"), r, c, v, ns, d)
    write_shard(str(tmp_path / "bits" / "shard_0"), r, c, v, ns, d,
                layout="bits")
    return n


def test_shard_reader_autodetects_bits_layout(tmp_path):
    from metagenome_vector_sketches_tpu.matrix.reader import MatrixReader
    n = _write_both_layouts(tmp_path)
    nat = MatrixReader(str(tmp_path / "native"))
    bits = MatrixReader(str(tmp_path / "bits"))
    assert nat.shard(0).index.fmt == "native"
    assert bits.shard(0).index.fmt == "bits"
    a = nat.decode_all_triples(n)
    b = bits.decode_all_triples(n)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_query_stack_over_bits_layout(tmp_path):
    from metagenome_vector_sketches_tpu.io.dbfolder import DbFolder
    from metagenome_vector_sketches_tpu.query.engine import query
    n = _write_both_layouts(tmp_path, seed=18)
    db = DbFolder(str(tmp_path / "db"))
    names, norms = db.names_and_norms_f32()
    res = query(str(tmp_path / "bits"), [0, 1], norms, names)
    assert res[0].self_id == "S0"
    assert "S1" in res[0].neighbor_ids  # the identical row
    assert res[0].jaccard_similarities[0] == 1.0


def test_tiny_native_shard_not_misdetected(tmp_path):
    """A 2-row native shard packs its row cv at width 1 — the header alone
    collides with the bits mask identity; full-structure detection must
    still pick native."""
    from metagenome_vector_sketches_tpu.io.dbfolder import DbFolder
    from metagenome_vector_sketches_tpu.matrix.writer import write_shard
    from metagenome_vector_sketches_tpu.matrix.reader import MatrixReader
    d = 32
    V = np.tile(np.arange(1, d + 1, dtype=np.int32), (2, 1))
    db = DbFolder.write(str(tmp_path / "db"), ["a", "b"], V, d)
    _, norms = db.names_and_norms()
    ns = norms * norms
    r = np.array([0, 0, 1, 1])
    c = np.array([0, 1, 0, 1])
    v = (V.astype(np.int64) @ V.astype(np.int64).T)[r, c]
    write_shard(str(tmp_path / "m" / "shard_0"), r, c, v, ns, d)
    reader = MatrixReader(str(tmp_path / "m"))
    assert reader.shard(0).index.fmt == "native"
    rr, cc, qq = reader.decode_all_triples(2)
    assert set(zip(rr.tolist(), cc.tolist())) == {(0, 0), (0, 1), (1, 0), (1, 1)}
    assert np.all(qq == 255)


# ---------------------------------------------------------------------------
# legacy formats in the bits layout (+ zstd): as-found server artifacts
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("fmt", ["ef", "rice", "sorted"])
def test_legacy_bits_layout_zstd_round_trip(tmp_path, fmt):
    """Historical server shards = bits-layout codecs + .zst files; the
    legacy readers must ingest them exactly as found and agree with the
    native-layout decode."""
    from metagenome_vector_sketches_tpu.matrix import legacy
    rng = np.random.default_rng(23)
    n = 5
    rows = np.repeat(np.arange(n), 6)
    cols = np.tile(np.sort(rng.choice(80, size=6, replace=False)), n)
    vals = rng.integers(1, 10**6, size=len(rows))
    d = 128
    a, b = str(tmp_path / "native"), str(tmp_path / "bits")
    if fmt == "ef":
        legacy.write_legacy_ef(a, rows, cols, vals, d)
        legacy.write_legacy_ef(b, rows, cols, vals, d, layout="bits")
        read = legacy.read_legacy_ef
    elif fmt == "rice":
        legacy.write_legacy_rice(a, rows, cols, vals, d)
        legacy.write_legacy_rice(b, rows, cols, vals, d, layout="bits")
        read = legacy.read_legacy_rice
    else:
        norms_sq = rng.uniform(500, 5000, size=80)
        legacy.write_legacy_sorted(a, rows, cols, vals, norms_sq, d)
        legacy.write_legacy_sorted(b, rows, cols, vals, norms_sq, d,
                                   layout="bits")
        read = legacy.read_legacy_sorted
    legacy.compress_legacy_folder(b)   # the as-left state: .zst only
    import os
    assert all(name.endswith(".zst") for name in os.listdir(b))
    want = read(a)
    got = read(b)
    assert want.keys() == got.keys()
    for r in want:
        np.testing.assert_array_equal(want[r][0], got[r][0])
        np.testing.assert_array_equal(want[r][1], got[r][1])


def test_ef_decode_index_zeros_variant():
    """elias_fano<index_zeros=true> carries a second (select0) darray whose
    header can accidentally satisfy the compact_vector mask identity — the
    decoder must fall back to the two-darray reading via the low/high size
    invariant (round-1 review finding, confirmed repro: [2,5,9,12] u=16)."""
    v = np.array([2, 5, 9, 12], dtype=np.uint64)
    blob = bc.ef_encode(v, 16, index_zeros=True)
    got, consumed = bc.ef_decode(blob)
    assert consumed == len(blob)
    np.testing.assert_array_equal(got, v)
    rng = np.random.default_rng(19)
    for n, u in [(1, 5), (50, 1000), (1000, 10**7)]:
        vv = np.sort(rng.integers(0, u, size=n).astype(np.uint64))
        blob = bc.ef_encode(vv, u, index_zeros=True)
        got, consumed = bc.ef_decode(blob)
        assert consumed == len(blob)
        np.testing.assert_array_equal(got, vv)


def test_zstdio_multiframe(tmp_path):
    """pzstd / concatenated .zst files are multi-frame; decompress must
    read every frame on both backends (round-2 review finding)."""
    from metagenome_vector_sketches_tpu.utils import zstdio
    a = zstdio.compress(b"hello ") + zstdio.compress(b"world")
    assert zstdio.decompress(a) == b"hello world"
    lib = zstdio._load_libzstd()
    if lib is not None:
        assert zstdio._decompress_libzstd(lib, a) == b"hello world"
    # a legacy folder whose .zst was produced by concatenation
    from metagenome_vector_sketches_tpu.matrix import legacy
    rows = np.repeat(np.arange(3), 4)
    cols = np.tile(np.arange(4) * 3, 3)
    vals = np.arange(12) * 1000 + 5000
    folder = str(tmp_path / "m")
    legacy.write_legacy_prev(folder, rows, cols, vals, 64)
    import os
    for name in list(os.listdir(folder)):
        full = os.path.join(folder, name)
        data = open(full, "rb").read()
        half = len(data) // 2
        with open(full + ".zst", "wb") as f:   # two frames per file
            f.write(zstdio.compress(data[:half]) + zstdio.compress(data[half:]))
        os.remove(full)
    got = legacy.read_legacy_prev(folder)
    assert set(got.keys()) == {0, 1, 2}
