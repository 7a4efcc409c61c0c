import numpy as np
import jax.numpy as jnp

from metagenome_vector_sketches_tpu.ops.splitmix import (
    splitmix64_np, splitmix64_u32, split_u64, join_u64,
)


def _cpp_splitmix(x: int) -> int:
    """Direct transcription of the reference finalizer semantics in pure int."""
    M = (1 << 64) - 1
    x = (x + 0x9E3779B97F4A7C15) & M
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & M
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & M
    x = x ^ (x >> 31)
    return x


def test_numpy_matches_pure_python():
    rng = np.random.default_rng(0)
    xs = rng.integers(0, 1 << 64, size=4096, dtype=np.uint64)
    got = splitmix64_np(xs)
    want = np.array([_cpp_splitmix(int(x)) for x in xs], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


def test_u32_emulation_matches_numpy():
    rng = np.random.default_rng(1)
    xs = rng.integers(0, 1 << 64, size=8192, dtype=np.uint64)
    # include adversarial values around carry/overflow boundaries
    edge = np.array([0, 1, (1 << 32) - 1, 1 << 32, (1 << 64) - 1,
                     0xFFFFFFFF00000000, 0x00000000FFFFFFFF], dtype=np.uint64)
    xs = np.concatenate([xs, edge])
    hi, lo = split_u64(xs)
    rhi, rlo = splitmix64_u32(jnp.asarray(hi), jnp.asarray(lo))
    got = join_u64(np.asarray(rhi), np.asarray(rlo))
    np.testing.assert_array_equal(got, splitmix64_np(xs))
