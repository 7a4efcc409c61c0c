"""Pallas TPU kernel for the pairwise counts sweep.

The grid walks (row-block, col-block) tiles of the plane-decomposed database
(ops.pairwise.decompose_planes: balanced limbs + precomputed Karatsuba limb
sums); each step runs L(L+1)/2 plain int8 MXU matmuls with the float32
weighted combine and retention-threshold epilogue entirely in VMEM and emits
ONE int32 survivor count per tile — the same contract as
ops.pairwise.sweep_counts, expressed as a single pallas_call over the whole
sweep (no per-tile dispatch, no dynamic-slice scan machinery, and no
elementwise int8 work in the kernel, which Mosaic rejects).

Used on TPU when available (ops.pairwise.sweep_counts remains the portable
XLA path; tests check equivalence in interpreter mode on tiny shapes).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(P: int, d: int, block: int):
    from .pairwise import SLACK_ABS, SLACK_REL, limbs_from_planes, plane_weights
    weights = plane_weights(limbs_from_planes(P))
    del block  # the kernel body is shape-polymorphic over (block_i, block_j)

    def kernel(vi_ref, vj_ref, thr_i_ref, thr_j_ref, count_ref):
        def mm(x, y):
            return jax.lax.dot_general(
                x, y, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)

        # weighted Karatsuba plane combine — L(L+1)/2 plain MXU matmuls
        # (see ops.pairwise.approx_dot_f32)
        approx = mm(vi_ref[0], vj_ref[0]).astype(jnp.float32) * weights[0]
        for p in range(1, P):
            approx = approx + mm(vi_ref[p], vj_ref[p]).astype(jnp.float32) * weights[p]
        thr = 0.05 * (thr_i_ref[0][:, None] + thr_j_ref[0][None, :])
        passes = approx / np.float32(d) > thr * SLACK_REL - SLACK_ABS
        # per-tile scalar broadcast into the (8,128)-padded output tile
        count_ref[0, 0, :, :] = jnp.full((8, 128), jnp.sum(passes.astype(jnp.int32)),
                                         jnp.int32)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("row_t0", "row_t1", "block", "block_j",
                                    "interpret"))
def pallas_sweep_counts(planes, thr, row_t0: int = 0, row_t1: int | None = None,
                        block: int = 512, block_j: int | None = None,
                        interpret: bool = False):
    """Survivor counts for row tiles [row_t0, row_t1) x ALL column tiles.

    Args:
      planes: (P, Npad, d) int8 Karatsuba planes (decompose_planes),
        Npad % block == 0; padding rows need thr = +inf. On TPU `block` must
        be a multiple of 128 and the (P, block, d) blocks of both operand
        sides must fit VMEM (block=512 at d=2048, P=3 uses ~6 MB).
      thr: (Npad,) float32 squared norms.
      block_j: column-tile edge (defaults to `block`). The column side is
        the STREAMED operand (its DMA re-fires every grid step, the row
        block only when the row index changes), so the roofline intensity
        of the sweep is 2*block int8-ops per fetched byte; when VMEM cannot
        hold the symmetric pair at a compute-bound block (the P=6 int16
        schedule: 2*6.3 MB double-buffered at block 512), keep block_j at
        256 and GROW the row block instead — same VMEM high-water, double
        the intensity.

    Returns: (row_t1-row_t0, Npad//block_j) int32 per-tile survivor counts
      for (block x block_j) tiles.
    """
    P, npad, d = planes.shape
    if block_j is None:
        block_j = block
    # loud failure, not a silently truncated grid: npad // block would
    # drop the tail rows/columns from the sweep entirely
    assert npad % block == 0 and npad % block_j == 0, \
        f"Npad={npad} must be a multiple of block={block} and {block_j}"
    nti = npad // block
    ntj = npad // block_j
    if row_t1 is None:
        row_t1 = nti
    assert 0 <= row_t0 <= row_t1 <= nti, (row_t0, row_t1, nti)
    kernel = _make_kernel(P, d, block)
    grid = (row_t1 - row_t0, ntj)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((P, block, d), lambda i, j: (0, i + row_t0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, block_j, d), lambda i, j: (0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i, j: (0, i + row_t0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_j), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, 128), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((row_t1 - row_t0, ntj, 8, 128),
                                       jnp.int32),
        interpret=interpret,
    )(planes, planes, thr.reshape(1, -1), thr.reshape(1, -1))
    return out[:, :, 0, 0]


def available() -> bool:
    """Pallas TPU path is usable only on a real TPU backend."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
