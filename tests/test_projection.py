
import numpy as np
import pytest

from metagenome_vector_sketches_tpu.ops.projection import (
    project_host, project_device_many,
)


def _reference_projection(hashes, d):
    """Pure-python transcription of transform_set_into_vector semantics
    (reference src/random_projection.cpp:9-26)."""
    M = (1 << 64) - 1
    vec = np.zeros(d, dtype=np.int64)
    for h in hashes:
        for i in range(0, d, 64):
            x = (int(h) + i) & M
            x = (x + 0x9E3779B97F4A7C15) & M
            x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & M
            x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & M
            x = x ^ (x >> 31)
            for n in range(min(64, d - i)):
                vec[i + n] += 1 - 2 * ((x >> n) & 1)
    return vec.astype(np.int32)


@pytest.mark.parametrize("d", [64, 128, 200, 2048])
def test_host_projection_bit_exact(d):
    rng = np.random.default_rng(7)
    hashes = rng.integers(0, 1 << 64, size=97, dtype=np.uint64)
    got = project_host(hashes, d)
    want = _reference_projection(hashes, d)
    np.testing.assert_array_equal(got, want)


def test_device_projection_matches_host():
    rng = np.random.default_rng(8)
    d = 256
    sets = [rng.integers(0, 1 << 64, size=n, dtype=np.uint64)
            for n in [1, 3, 17, 255, 256, 300, 1000]]
    got = project_device_many([list(map(int, s)) for s in sets], d)
    for i, s in enumerate(sets):
        np.testing.assert_array_equal(got[i], project_host(s, d))


def test_empty_set_projects_to_zero():
    assert np.all(project_host(np.array([], dtype=np.uint64), 128) == 0)


def test_device_projection_edges():
    """Device path at a non-64-multiple d (tail trim), SWAR chunk-edge set
    sizes (14/15/16 hashes), and an empty set in the batch."""
    rng = np.random.default_rng(9)
    d = 200
    sets = [rng.integers(0, 1 << 64, size=n, dtype=np.uint64)
            for n in [14, 15, 16, 31, 2]]
    sets.append(np.array([], dtype=np.uint64))
    got = project_device_many([list(map(int, s)) for s in sets], d)
    for i, s in enumerate(sets):
        np.testing.assert_array_equal(got[i], project_host(s, d), err_msg=f"set {i}")
    assert np.all(got[-1] == 0)
