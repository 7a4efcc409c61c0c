"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: pairwise sims/sec/chip at d=2048 — the reference's flagship compute
(blocked integer GEMM + retention threshold), run here as the real TPU
pipeline: int8 limb matmuls on the MXU + on-device threshold + candidate
compaction (ops.pairwise.tile_candidates), timed over a full synthetic
all-vs-all sweep. vs_baseline compares against the reference's own hot loop
measured on CPU in this environment (BASELINE_MEASURED.json).

Also measured (reported in "extras"): sketch projection throughput
(hashes/sec and vectors/sec, device path) and flat-IP top-k query throughput.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def bench_pairwise(N=8192, d=2048, tile=2048, max_abs=1500, repeats=2):
    import jax
    import jax.numpy as jnp
    from metagenome_vector_sketches_tpu.ops import pairwise as pw

    rng = np.random.default_rng(0)
    V = rng.integers(-max_abs, max_abs + 1, size=(N, d)).astype(np.int32)
    norms_sq = (np.einsum("ij,ij->i", V.astype(np.float64), V.astype(np.float64))
                / d).astype(np.float32)
    L = pw.pick_limbs(max_abs)
    limbs = pw.decompose_limbs(jnp.asarray(V), L)
    limbs.block_until_ready()
    thr = jnp.asarray(norms_sq)
    cap = 65536

    tiles = [(i, j) for i in range(0, N, tile) for j in range(0, N, tile)]

    def sweep():
        outs = []
        for (i, j) in tiles:
            idx, pab, count = pw.tile_candidates(
                limbs[:, i:i + tile], limbs[:, j:j + tile],
                thr[i:i + tile], thr[j:j + tile], cap=cap)
            outs.append(count)
        jax.block_until_ready(outs)
        return outs

    sweep()  # warm-up / compile
    t0 = time.perf_counter()
    for _ in range(repeats):
        sweep()
    dt = (time.perf_counter() - t0) / repeats
    pairs = float(N) * N
    return pairs / dt, {"N": N, "d": d, "tile": tile, "L": L,
                        "sweep_secs": round(dt, 4)}


def bench_projection(B=64, H=4096, d=2048, repeats=3):
    import jax.numpy as jnp
    from metagenome_vector_sketches_tpu.ops.projection import project_device_batch
    from metagenome_vector_sketches_tpu.ops.splitmix import split_u64

    rng = np.random.default_rng(1)
    hashes = rng.integers(0, 1 << 64, size=(B, H), dtype=np.uint64)
    counts = np.full(B, H, dtype=np.int32)
    hi, lo = split_u64(hashes)
    hi, lo, cj = jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(counts)
    project_device_batch(hi, lo, cj, d).block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(repeats):
        project_device_batch(hi, lo, cj, d).block_until_ready()
    dt = (time.perf_counter() - t0) / repeats
    return {"hashes_per_sec": B * H / dt, "vectors_per_sec": B / dt,
            "B": B, "H": H, "d": d}


def bench_topk(N=65536, d=2048, B=256, k=50, repeats=3):
    import jax.numpy as jnp
    from metagenome_vector_sketches_tpu.ann.flat_index import FlatIPIndex, normalize_l2

    rng = np.random.default_rng(2)
    V = normalize_l2(rng.normal(size=(N, d)).astype(np.float32))
    Q = normalize_l2(rng.normal(size=(B, d)).astype(np.float32))
    idx = FlatIPIndex(V)
    idx.search(Q, k)  # compile
    t0 = time.perf_counter()
    for _ in range(repeats):
        idx.search(Q, k)
    dt = (time.perf_counter() - t0) / repeats
    return {"queries_per_sec": B / dt, "N": N, "B": B, "k": k}


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BASELINE_MEASURED.json")) as f:
        base = json.load(f)
    baseline_pps = base["pairwise_d2048"]["pairs_per_sec"]
    baseline_proj = base["projection_d2048"]["hashes_per_sec"]

    pps, pair_extras = bench_pairwise()
    proj = bench_projection()
    topk = bench_topk()

    import jax
    result = {
        "metric": "pairwise_sims_per_sec_per_chip_d2048",
        "value": round(pps, 1),
        "unit": "pairs/s",
        "vs_baseline": round(pps / baseline_pps, 2),
        "extras": {
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "pairwise": pair_extras,
            "projection": {**{k: round(v, 1) if isinstance(v, float) else v
                              for k, v in proj.items()},
                           "vs_baseline": round(proj["hashes_per_sec"] / baseline_proj, 2)},
            "flat_ip_topk": {k: round(v, 1) if isinstance(v, float) else v
                             for k, v in topk.items()},
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
