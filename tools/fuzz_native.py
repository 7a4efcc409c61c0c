"""ASAN corruption fuzz for the native parsers (codecs + sigscan).

Builds AddressSanitizer builds of native/codecs.cpp and native/sigscan.cpp
into a temp dir, then drives them with randomly corrupted inputs:

- codecs: encode with the real encoders, then flip random bytes / corrupt
  size headers; every decode must either round-trip or raise cleanly —
  never touch memory out of bounds or size an allocation from an
  untrusted header (this harness found the round-3 Elias-Fano multi-TB
  malloc, fixed in native/codecs.cpp + codecs/pyref.py).
- sigscan: byte flips, truncations, and central-directory-targeted
  corruption of a real .sig.zip.

Run:  python tools/fuzz_native.py [trials]
Requires g++ with libasan (baked into the image). Exits non-zero on any
ASAN report (the interposed malloc aborts the process) or assertion.
"""

import ctypes
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def build_asan(tmp):
    cc = os.environ.get("CXX", "g++")
    paths = {}
    for src, name, extra in (("codecs.cpp", "codecs", []),
                             ("sigscan.cpp", "sigscan", ["-lz"])):
        out = os.path.join(tmp, f"libmvs_{name}_asan.so")
        subprocess.run([cc, "-O1", "-g", "-fPIC", "-shared",
                        "-fsanitize=address", "-o", out,
                        os.path.join(REPO, "native", src)] + extra,
                       check=True)
        paths[name] = out
    return paths


def fuzz_codecs(lib_path, trials, rng):
    import metagenome_vector_sketches_tpu.codecs.native as native
    native._LIB_PATH = lib_path
    from metagenome_vector_sketches_tpu.codecs import pyref
    cnt = 0
    for _ in range(trials):
        k = int(rng.integers(1, 60))
        uni = int(rng.integers(k + 1, 100000))
        vals = np.sort(rng.choice(uni, size=k, replace=False)
                       ).astype(np.uint64)
        free = rng.integers(0, 1 << int(rng.integers(1, 32)),
                            size=k).astype(np.uint64)
        for enc, ndec, pdec, args in (
                (native.cv_encode, native.cv_decode, pyref.cv_decode,
                 (free,)),
                (native.rice_encode, native.rice_decode, pyref.rice_decode,
                 (free,)),
                (native.ef_encode, native.ef_decode, pyref.ef_decode,
                 (vals, uni))):
            b = bytearray(enc(*args))
            for _ in range(8):
                bb = bytearray(b)
                for _ in range(int(rng.integers(1, 4))):
                    bb[int(rng.integers(0, len(bb)))] = \
                        int(rng.integers(0, 256))
                for dec in (ndec, pdec):
                    try:
                        dec(bytes(bb))
                    except Exception:
                        pass
                    cnt += 1
        starts = np.array([0, k], dtype=np.uint64)
        cols = np.cumsum(rng.integers(1, 50, size=k)).astype(np.uint64)
        q = rng.integers(0, 256, size=k).astype(np.uint64)
        blob, pos, first = native.write_matrix_rows(cols, q, starts)
        for _ in range(8):
            bb = bytearray(blob)
            for _ in range(int(rng.integers(1, 4))):
                bb[int(rng.integers(0, len(bb)))] = int(rng.integers(0, 256))
            try:
                native.read_matrix_rows(bytes(bb), pos, first)
            except Exception:
                pass
            cnt += 1
        # fuzz the ADDRESSES too: real addrs are cumsums of untrusted
        # rice-decoded deltas out of row_index.bin, so arbitrary u64s
        # (incl. near-UINT64_MAX wrap candidates) must be rejected, not
        # dereferenced (the round-3 `off + 24 > len` wrap lived here)
        for _ in range(8):
            wild = rng.integers(0, 1 << 64, size=int(rng.integers(1, 4)),
                                dtype=np.uint64)
            if rng.integers(0, 2):
                wild[0] = np.uint64(
                    0xFFFFFFFFFFFFFFFF - int(rng.integers(0, 64)))
            try:
                native.read_matrix_rows(
                    blob, wild,
                    rng.integers(0, 1 << 32,
                                 size=len(wild)).astype(np.uint64))
            except Exception:
                pass
            cnt += 1
    return cnt


def fuzz_sigscan(lib_path, trials, rng, tmp):
    lib = ctypes.CDLL(lib_path)
    lib.sigscan_read.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint64))]
    lib.sigscan_read.restype = ctypes.c_int64
    lib.sigscan_free.argtypes = [ctypes.POINTER(ctypes.c_uint64)]
    src = os.environ.get(
        "FUZZ_SIGZIP",
        "/root/reference/test/toy/DRR000001.unitigs.fa.sig.zip")
    if not os.path.exists(src):
        print("no sig.zip sample available; skipping sigscan fuzz")
        return 0
    orig = open(src, "rb").read()
    path = os.path.join(tmp, "fuzz_sig.zip")
    cnt = 0
    for trial in range(trials):
        bb = bytearray(orig)
        mode = trial % 3
        if mode == 0:
            for _ in range(int(rng.integers(1, 8))):
                bb[int(rng.integers(0, len(bb)))] = int(rng.integers(0, 256))
        elif mode == 1:
            bb = bb[:int(rng.integers(0, len(bb)))]
        else:  # target the central directory at the tail
            for _ in range(int(rng.integers(1, 8))):
                bb[len(bb) - 1 - int(rng.integers(0, min(200, len(bb))))] \
                    = int(rng.integers(0, 256))
        with open(path, "wb") as f:
            f.write(bytes(bb))
        out = ctypes.POINTER(ctypes.c_uint64)()
        n = lib.sigscan_read(path.encode(), 31, ctypes.byref(out))
        if n >= 0 and out:
            lib.sigscan_free(out)
        cnt += 1
    return cnt


def fuzz_hashparse(lib_path, trials, rng, tmp):
    """Corrupted all_hashes.txt against hashparse_read (r5): random bytes,
    truncations, colon/newline storms, giant tokens — must error or parse,
    never fault; successful outputs are freed."""
    lib = ctypes.CDLL(lib_path)
    lib.hashparse_read.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint64)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_char)),
        ctypes.POINTER(ctypes.c_int64)]
    lib.hashparse_read.restype = ctypes.c_int64
    lib.hashparse_free.argtypes = [ctypes.c_void_p]
    base = b"acc1: 123 456 789\nacc2: 5 5 5\nnocolon\nempty:\n"
    path = os.path.join(tmp, "fuzz_hashes.txt")
    cnt = 0
    for trial in range(trials):
        mode = trial % 4
        if mode == 0:
            bb = bytearray(base * int(rng.integers(1, 50)))
            for _ in range(int(rng.integers(1, 16))):
                bb[int(rng.integers(0, len(bb)))] = int(rng.integers(0, 256))
            data = bytes(bb)
        elif mode == 1:
            data = bytes(rng.integers(0, 256, size=int(
                rng.integers(0, 4096)), dtype=np.uint8))
        elif mode == 2:
            data = bytes(rng.choice(
                list(b": \n\r\t0123456789x"),
                size=int(rng.integers(0, 4096))).astype(np.uint8))
        else:
            data = b"a: " + b"9" * int(rng.integers(1, 64)) + b"\n"
        with open(path, "wb") as f:
            f.write(data)
        hp = ctypes.POINTER(ctypes.c_uint64)()
        op = ctypes.POINTER(ctypes.c_int64)()
        nmp = ctypes.POINTER(ctypes.c_char)()
        nlen = ctypes.c_int64()
        n = lib.hashparse_read(path.encode(), ctypes.byref(hp),
                               ctypes.byref(op), ctypes.byref(nmp),
                               ctypes.byref(nlen))
        if n >= 0:
            lib.hashparse_free(hp)
            lib.hashparse_free(op)
            lib.hashparse_free(nmp)
        cnt += 1
    return cnt


def _corrupt(rng, b: bytes) -> bytes:
    """Byte flips / truncation / header-targeted corruption of a blob."""
    bb = bytearray(b)
    mode = int(rng.integers(0, 3))
    if mode == 0 and len(bb):
        for _ in range(int(rng.integers(1, 5))):
            bb[int(rng.integers(0, len(bb)))] = int(rng.integers(0, 256))
    elif mode == 1:
        bb = bb[:int(rng.integers(0, len(bb) + 1))]
    else:  # target the first 40 bytes (the size/width/universe headers)
        for _ in range(int(rng.integers(1, 5))):
            bb[int(rng.integers(0, min(40, len(bb))))] = \
                int(rng.integers(0, 256))
    return bytes(bb)


def fuzz_bitscompat(trials, rng):
    """The reconstructed jermp/bits-layout decoders (codecs/bitscompat.py):
    pure python, so the bug class is untrusted-header-driven allocation
    (MemoryError here = finding, same rule as the r3 Elias-Fano malloc)
    and uncaught non-ValueError crashes."""
    from metagenome_vector_sketches_tpu.codecs import bitscompat as bc
    cnt = 0
    for _ in range(trials):
        k = int(rng.integers(1, 60))
        uni = int(rng.integers(k + 1, 100000))
        vals = np.sort(rng.choice(uni, size=k, replace=False)
                       ).astype(np.uint64)
        free = rng.integers(0, 1 << int(rng.integers(1, 32)),
                            size=k).astype(np.uint64)
        blobs = [(bc.cv_decode, bc.cv_encode(free)),
                 (bc.rice_decode, bc.rice_encode(free)),
                 (bc.ef_decode, bc.ef_encode(vals, uni)),
                 (bc.ef_decode, bc.ef_encode(vals, uni, index_zeros=True))]
        for dec, blob in blobs:
            for _ in range(8):
                bad = _corrupt(rng, blob)
                try:
                    dec(bad)
                except MemoryError:
                    raise AssertionError(
                        "bitscompat: corrupted header drove a giant "
                        "allocation (untrusted-header rule violated)")
                except (ValueError, IndexError):
                    pass
                cnt += 1
            # pure-random buffers through the layout autodetect too
            junk = rng.integers(0, 256,
                                size=int(rng.integers(0, 200))) \
                .astype(np.uint8).tobytes()
            try:
                bc.detect_two(junk, "cv")
            except (ValueError, IndexError):
                pass
            try:
                bc.sniff_cv(junk)
            except (ValueError, IndexError):
                pass
            cnt += 2
    return cnt


def fuzz_faissio(trials, rng, tmp):
    """The FAISS IndexFlat header parser (ann/faissio.py): corrupted
    headers must raise ValueError, never allocate from the claimed count
    (np.fromfile pre-allocates — the cap check precedes it)."""
    from metagenome_vector_sketches_tpu.ann import faissio
    path = os.path.join(tmp, "fuzz_faiss.index")
    good = os.path.join(tmp, "good_faiss.index")
    V = rng.normal(size=(17, 32)).astype(np.float32)
    faissio.write_flat(good, V)
    orig = open(good, "rb").read()
    cnt = 0
    for _ in range(trials):
        with open(path, "wb") as f:
            f.write(_corrupt(rng, orig))
        try:
            out, _ = faissio.read_flat(path)
            assert out.nbytes <= 16 * len(orig), \
                "faissio returned more data than the file could hold"
        except MemoryError:
            raise AssertionError(
                "faissio: corrupted header drove a giant allocation")
        except ValueError:
            pass
        cnt += 1
    return cnt


def main():
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    rng = np.random.default_rng(int(os.environ.get("FUZZ_SEED", "1")))
    with tempfile.TemporaryDirectory() as tmp:
        libs = build_asan(tmp)
        if "LD_PRELOAD" not in os.environ:
            # re-exec with libasan preloaded so the interceptors are active
            asan = subprocess.run(
                [os.environ.get("CXX", "g++"), "-print-file-name=libasan.so"],
                capture_output=True, text=True).stdout.strip()
            env = dict(os.environ, LD_PRELOAD=asan,
                       ASAN_OPTIONS="detect_leaks=0")
            sys.exit(subprocess.run([sys.executable] + sys.argv,
                                    env=env).returncode)
        c1 = fuzz_codecs(libs["codecs"], trials, rng)
        c2 = fuzz_sigscan(libs["sigscan"], trials * 2, rng, tmp)
        c3 = fuzz_bitscompat(trials, rng)
        c4 = fuzz_faissio(trials * 4, rng, tmp)
        c5 = fuzz_hashparse(libs["sigscan"], trials * 2, rng, tmp)
        print(f"FUZZ OK: {c1} corrupted codec decodes, "
              f"{c2} corrupted zips, {c3} corrupted bits-layout decodes, "
              f"{c4} corrupted FAISS headers, "
              f"{c5} corrupted hashes files — zero memory faults")


if __name__ == "__main__":
    main()
