"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: pairwise sims/sec/chip at d=2048 — the reference's flagship compute
(blocked integer GEMM + retention threshold), run here as the real TPU
pipeline: int8 Karatsuba plane matmuls on the MXU with the threshold fused
into the epilogue (ops.pairwise.sweep_counts / the pallas kernel), timed
over a full synthetic all-vs-all sweep. vs_baseline compares against the reference's own hot loop
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


# Per-chip peak int8 MXU throughput (ops/s, multiply+add = 2 ops) by JAX
# device_kind — used to report MFU next to every kernel number so a
# physically impossible measurement (marginal-timing noise crediting >100%
# of peak, the round-2 failure) is caught instead of printed. Public specs:
# v5e 394.7 int8 TOPS, v5p 918.3, v4 275 (no int8 doubling), v6e 1836.
_PEAK_INT8_OPS = {
    "TPU v5 lite": 394.7e12,
    "TPU v5e": 394.7e12,
    "TPU v5": 918.3e12,
    "TPU v5p": 918.3e12,
    "TPU v4 lite": 138.0e12,
    "TPU v4": 275.0e12,
    "TPU v6 lite": 1836.0e12,
    "TPU v6e": 1836.0e12,
}
# startswith matching below requires longest-prefix-first within a family
# ("TPU v4 lite" before "TPU v4"), or the lite entry is unreachable.


def _peak_int8_ops():
    import jax
    kind = jax.devices()[0].device_kind
    for key, peak in _PEAK_INT8_OPS.items():
        if kind.startswith(key):
            return peak, kind
    return None, kind


def _mfu_fields(ops: float, seconds: float, amortized_seconds: float):
    """MFU bookkeeping for one kernel measurement.

    `seconds` is the marginal per-iteration estimate (can be noise-corrupted
    on a high-latency tunnel — it is a DIFFERENCE of two walls);
    `amortized_seconds` is wall/n of the longest chain, an upper bound on the
    true per-iteration time (includes one dispatch amortized over n), so the
    throughput it implies is a certified LOWER bound. If the marginal claims
    more than 100% of chip peak it is a measurement fault: fall back to the
    amortized number and flag it.
    """
    peak, kind = _peak_int8_ops()
    out = {}
    if peak is None:
        out["mfu"] = None
        out["mfu_note"] = f"unknown device kind {kind!r}"
        return seconds, out
    mfu = ops / seconds / peak
    mfu_lb = ops / amortized_seconds / peak
    out["mfu_lower_bound"] = round(mfu_lb, 4)
    if mfu > 1.0:
        out["mfu"] = round(min(mfu_lb, 1.0), 4)
        out["mfu_marginal_rejected"] = round(mfu, 4)
        out["mfu_note"] = ("marginal timing exceeded chip peak "
                           "(measurement fault); amortized wall used")
        return amortized_seconds, out
    out["mfu"] = round(mfu, 4)
    return seconds, out


def bench_pairwise(N=8192, d=2048, tile=2048, max_abs=1500, reps=10):
    """Headline: the counts sweep (the engine's phase-1 hot loop, one jitted
    lax.scan over the whole tile grid). Measured as the MARGINAL time per
    sweep over a chain of data-dependent sweeps ending in one host read, so
    dispatch/transfer latency (large on tunneled devices) doesn't pollute the
    device-throughput number; the end-to-end wall time is reported too."""
    import jax
    import jax.numpy as jnp
    from metagenome_vector_sketches_tpu.ops import pairwise as pw

    rng = np.random.default_rng(0)
    V = rng.integers(-max_abs, max_abs + 1, size=(N, d)).astype(np.int32)
    norms_sq = (np.einsum("ij,ij->i", V.astype(np.float64), V.astype(np.float64))
                / d).astype(np.float32)
    L = pw.pick_limbs(max_abs)
    limbs = pw.decompose_planes(jnp.asarray(V), L)
    limbs.block_until_ready()
    thr = jnp.asarray(norms_sq)
    nt = N // tile
    coords = jnp.asarray(np.array([(r, c) for r in range(nt) for c in range(nt)],
                                  dtype=np.int32))

    import functools

    @functools.partial(jax.jit, static_argnames=("tile",))
    def sweep_seeded(limbs, thr, coords, seed, tile):
        # data dependence via seed forces sequential real execution of the chain
        return pw.sweep_counts_impl(limbs, thr, coords, tile) + seed * 0

    @functools.partial(jax.jit, static_argnames=("block", "block_j"))
    def pallas_seeded(limbs, thr, seed, block, block_j=None):
        from metagenome_vector_sketches_tpu.ops.pallas_pairwise import (
            pallas_sweep_counts)
        c = pallas_sweep_counts.__wrapped__(limbs, thr, block=block,
                                            block_j=block_j)
        return c.reshape(-1) + seed * 0

    def chained(step, shape, n):
        t0 = time.perf_counter()
        acc = jnp.zeros(shape, jnp.int32)
        for _ in range(n):
            acc = step(acc)
        total = int(np.asarray(acc).sum())
        return time.perf_counter() - t0, total

    def measure(step, shape, rounds=5, chain_reps=None):
        """Median-of-`rounds` marginal sweep time, with the drift band
        (min/median/max of the per-round marginals) and the amortized
        per-iteration wall (best n-chain / n — an upper bound on true
        per-iteration time, so a certified throughput lower bound). The
        marginal is a DIFFERENCE of two walls, so taking the minimum would
        select rounds where the 1-iteration chain hit a latency spike (it
        can even go negative); the median is robust against spikes in
        either term. chain_reps lengthens the chains (halving marginal
        noise per doubling — used for the ~5 ms i16 sweeps whose roll-to-
        roll medians drifted +-15% at reps=10)."""
        n_reps = chain_reps or reps
        chained(step, shape, 1)  # warm-up / compile
        d_probe, _ = chained(step, shape, 1)
        if d_probe > 2.0:
            # pathological tunnel phase (observed dispatch RTT up to
            # ~3.6 s): keep the bench wall bounded; the amortized lower
            # bound stays valid, the marginal band will show the noise
            rounds = 2
            n_reps = reps
        margins, d1s, dns, total = [], [], [], 0
        for _ in range(rounds):
            d1, _ = chained(step, shape, 1)
            dn, total = chained(step, shape, n_reps)
            margins.append((dn - d1) / (n_reps - 1))
            d1s.append(d1)
            dns.append(dn)
        good = [m for m in margins if m > 0] or margins
        band = {"min_ms": round(min(good) * 1e3, 3),
                "median_ms": round(float(np.median(good)) * 1e3, 3),
                "max_ms": round(max(good) * 1e3, 3)}
        amortized = min(dns) / n_reps
        return float(np.median(good)), float(np.median(d1s)), total, \
            band, amortized

    per_sweep, d1, total, band, amort = measure(
        lambda acc: sweep_seeded(limbs, thr, coords, acc, tile=tile), (nt * nt,))
    P = pw.num_planes(L)
    sweep_ops = 2.0 * P * float(N) * N * d     # P int8 plane matmuls, 2 ops/MAC
    per_sweep, mfu = _mfu_fields(sweep_ops, per_sweep, amort)
    extras = {"N": N, "d": d, "tile": tile, "L": L,
              "xla_sweep_ms": round(per_sweep * 1e3, 3),
              "xla_sweep_band": band,
              "xla_mfu": mfu,
              "wall_one_sweep_ms": round(d1 * 1e3, 1),
              "candidates": total}

    from metagenome_vector_sketches_tpu.ops import pallas_pairwise as pp
    if pp.available():
        # Symmetric 512 is already comfortably compute-bound for P=3
        # (streamed-operand intensity 2*block = 1024 int8-ops/byte vs the
        # v5e ridge ~482); every attempt to grow the row block past
        # 512*P/3 rows ((1024, 512), (1024, 256)) failed Mosaic compile
        # (measured r5: remote HTTP 500), so the block sweep is P=6-only
        # (see the i16 section).
        for block, block_j in ((512, 512),):
            try:
                p_sweep, _, p_total, p_band, p_amort = measure(
                    lambda acc: pallas_seeded(limbs, thr, acc, block=block,
                                              block_j=block_j),
                    ((N // block) * (N // block_j),))
                p_sweep, p_mfu = _mfu_fields(sweep_ops, p_sweep, p_amort)
                tag = f"pallas_{block}x{block_j}"
                # Pallas and XLA float32 threshold decisions can disagree
                # on a borderline pair (different accumulation order) —
                # record the mismatch in the artifact instead of killing
                # the bench.
                extras[tag] = {"sweep_ms": round(p_sweep * 1e3, 3),
                               "band": p_band, "mfu": p_mfu,
                               "eq_xla": bool(p_total == total)}
                if p_total != total:
                    extras[tag]["count_delta"] = int(p_total - total)
                elif p_sweep < per_sweep:
                    per_sweep = p_sweep
                    extras["pallas_block"] = (block, block_j)
            except Exception as e:  # pragma: no cover
                extras[f"pallas_{block}x{block_j}_error"] = str(e)[:120]
        eqs = [v["eq_xla"] for k, v in extras.items()
               if k.startswith("pallas_") and isinstance(v, dict)]
        if eqs:
            extras["pallas_eq_xla"] = all(eqs)

    pairs = float(N) * N
    extras["sweep_ms"] = round(per_sweep * 1e3, 3)
    peak = _peak_int8_ops()[0]
    extras["mfu"] = round(sweep_ops / per_sweep / peak, 4) if peak else None

    # secondary: the int16-dtype sweep (L=3 -> 6 plane matmuls); full N so
    # the per-sweep time is long enough for a stable marginal measurement
    try:
        N16 = N
        V16 = rng.integers(-32768, 32768, size=(N16, d)).astype(np.int32)
        n16 = (np.einsum("ij,ij->i", V16.astype(np.float64),
                         V16.astype(np.float64)) / d).astype(np.float32)
        L16 = pw.pick_limbs(32767)
        p16 = pw.decompose_planes(jnp.asarray(V16), L16)
        p16.block_until_ready()
        t16 = jnp.asarray(n16)
        nt16 = N16 // tile
        c16 = jnp.asarray(np.array([(r, c) for r in range(nt16)
                                    for c in range(nt16)], dtype=np.int32))
        s16, _, t16_total, b16, a16 = measure(
            lambda acc: sweep_seeded(p16, t16, c16, acc, tile=tile),
            (nt16 * nt16,), chain_reps=25)
        ops16 = 2.0 * pw.num_planes(L16) * float(N16) * N16 * d
        s16, mfu16 = _mfu_fields(ops16, s16, a16)
        extras["i16_sweep_ms"] = round(s16 * 1e3, 3)
        extras["i16_sweep_band"] = b16
        extras["i16_mfu"] = mfu16
        # Pallas path for the 6-plane int16 schedule (VERDICT r3 item 7 /
        # r4 item 5). Symmetric block=256 sits AT the v5e roofline ridge
        # (streamed-operand intensity 2*block ~ 512 int8-ops/byte vs
        # peak/BW ~ 482) — the r4 0.82 MFU cap. The asymmetric (512, 128)
        # config doubles the intensity inside the same ~8 MB VMEM operand
        # budget ((512, 256) at P=6 is 9.4 MB and does not compile).
        if pp.available():
            for blk16, blkj16 in ((512, 128), (256, 256)):
                try:
                    ps16, _, pt16, pb16, pa16 = measure(
                        lambda acc: pallas_seeded(p16, t16, acc,
                                                  block=blk16,
                                                  block_j=blkj16),
                        ((N16 // blk16) * (N16 // blkj16),), chain_reps=25)
                    ps16, pmfu16 = _mfu_fields(ops16, ps16, pa16)
                    tag = f"i16_pallas_{blk16}x{blkj16}"
                    extras[tag] = {"sweep_ms": round(ps16 * 1e3, 3),
                                   "band": pb16, "mfu": pmfu16,
                                   "eq_xla": bool(pt16 == t16_total)}
                    if pt16 == t16_total and ps16 < s16:
                        s16 = ps16
                        extras["i16_mfu"] = pmfu16
                        extras["i16_pallas_block"] = (blk16, blkj16)
                except Exception as e:  # pragma: no cover
                    extras[f"i16_pallas_{blk16}x{blkj16}_error"] = \
                        str(e)[:120]
        extras["i16_pairs_per_sec"] = round(float(N16) * N16 / s16, 1)
    except Exception as e:  # pragma: no cover
        extras["i16_error"] = str(e)[:120]

    return pairs / per_sweep, extras


# THE canonical marginal-timing harness (shared with the scale
# benchmarks; VERDICT r2 weak #3 drift bands live there)
from metagenome_vector_sketches_tpu.utils.profiling import (  # noqa: E402
    marginal_time as _marginal,
)


def bench_projection(B=64, H=4096, d=2048):
    import jax.numpy as jnp
    from metagenome_vector_sketches_tpu.ops.projection import project_device_batch
    from metagenome_vector_sketches_tpu.ops.splitmix import split_u64

    rng = np.random.default_rng(1)
    hashes = rng.integers(0, 1 << 64, size=(B, H), dtype=np.uint64)
    counts = np.full(B, H, dtype=np.int32)
    hi, lo = split_u64(hashes)
    hi, lo = jnp.asarray(hi), jnp.asarray(lo)
    cj0 = jnp.asarray(counts)

    import functools
    import jax

    @functools.partial(jax.jit, static_argnames=("d",))
    def proj_seeded(hi, lo, cj, seed, d):
        v = project_device_batch.__wrapped__(hi, lo, cj, d)
        return jnp.sum(v) + seed * 0  # full reduce: nothing dead-code-eliminated

    def chain(n):
        t0 = time.perf_counter()
        seed = jnp.int32(0)
        for _ in range(n):
            seed = proj_seeded(hi, lo, cj0, seed, d)
        np.asarray(seed)
        return time.perf_counter() - t0

    dt, band = _marginal(chain, band=True)
    return {"hashes_per_sec": B * H / dt, "vectors_per_sec": B / dt,
            "B": B, "H": H, "d": d, "band": band}


def bench_topk(N=65536, d=2048, B=256, k=50):
    import jax
    import jax.numpy as jnp
    from metagenome_vector_sketches_tpu.ann.flat_index import (
        _chunk_topk, normalize_l2)

    rng = np.random.default_rng(2)
    V = jnp.asarray(normalize_l2(rng.normal(size=(N, d)).astype(np.float32)))
    Q0 = jnp.asarray(normalize_l2(rng.normal(size=(B, d)).astype(np.float32)))

    import functools

    @functools.partial(jax.jit, static_argnames=("k", "recall"))
    def topk_seeded(q, V, seed, k, recall):
        best_d = jnp.full((q.shape[0], k), -jnp.inf, jnp.float32)
        best_i = jnp.full((q.shape[0], k), -1, jnp.int32)
        D, I = _chunk_topk.__wrapped__(q, V, 0, best_d, best_i, k,
                                       recall_target=recall)
        return jnp.sum(D) + jnp.sum(I).astype(jnp.float32) + seed * 0

    def chain_for(recall):
        def chain(n):
            t0 = time.perf_counter()
            seed = jnp.float32(0)
            for _ in range(n):
                seed = topk_seeded(Q0, V, seed, k, recall)
            np.asarray(seed)
            return time.perf_counter() - t0
        return chain

    dt, band = _marginal(chain_for(1.0), band=True)
    dt_approx = _marginal(chain_for(0.95))
    res = {"queries_per_sec": B / dt,
           "queries_per_sec_recall95": B / dt_approx,
           "N": N, "B": B, "k": k, "band": band}

    # int8-plane exact engine (ann/int_index.py) on the same workload:
    # P int8 MXU matmuls per chunk + pooled exact finalize. Scan qps is
    # the device-resident serving number (marginal chain); full qps
    # includes the pool D2H + float64 host finalize (pays the tunnel's
    # fixed ~45 ms/batch here, which a local host would not).
    from metagenome_vector_sketches_tpu.ann.int_index import (
        IntExactIndex, _int_scan_pool, _host_planes)
    Vi = rng.integers(-1200, 1201, size=(N, d)).astype(np.int32)
    iidx = IntExactIndex(Vi, chunk_rows=min(65536, N))
    Qi = (Vi[:B] + rng.integers(-40, 41, size=(B, d))).astype(np.int32)
    pool = iidx.pool_for(k)
    qp0 = jnp.asarray(_host_planes(Qi, iidx.L))

    # stack passed as an ARG (a jit closure would embed it as an HLO
    # literal — remote-compile 413, see DESIGN.md traps)
    @functools.partial(jax.jit, static_argnames=("pool",))
    def int_seeded(qp, stack, inv_n, seed, pool):
        s_, i_, p_ = _int_scan_pool.__wrapped__(
            qp + (seed * 0).astype(jnp.int8), stack, inv_n, N, pool)
        return (jnp.sum(s_) + jnp.sum(i_).astype(jnp.float32)
                + jnp.sum(p_).astype(jnp.float32))

    def ichain(n):
        t0 = time.perf_counter()
        seed = jnp.float32(0)
        for _ in range(n):
            seed = int_seeded(qp0, iidx._stack, iidx._inv_n, seed, pool)
        float(np.asarray(seed))
        return time.perf_counter() - t0

    dt_int = _marginal(ichain)
    res["int8_scan_qps"] = B / dt_int

    # A/B the PartialReduce-based exact selector (approx_max_k at
    # recall_target=1.0) against lax.top_k: must be RESULT-EQUAL (both
    # exact) — record its speed only when equality holds on this backend
    s_t, i_t, p_t = _int_scan_pool(qp0, iidx._stack, iidx._inv_n, N, pool)
    s_p, i_p, p_p = _int_scan_pool(qp0, iidx._stack, iidx._inv_n, N, pool,
                                   selector="partial")
    if np.array_equal(np.asarray(i_t), np.asarray(i_p)):
        iidx.selector = "partial"

        @functools.partial(jax.jit, static_argnames=("pool",))
        def int_seeded_p(qp, stack, inv_n, seed, pool):
            s_, i_, p_ = _int_scan_pool.__wrapped__(
                qp + (seed * 0).astype(jnp.int8), stack, inv_n, N, pool,
                selector="partial")
            return (jnp.sum(s_) + jnp.sum(i_).astype(jnp.float32)
                    + jnp.sum(p_).astype(jnp.float32))

        def pchain(n):
            t0 = time.perf_counter()
            seed = jnp.float32(0)
            for _ in range(n):
                seed = int_seeded_p(qp0, iidx._stack, iidx._inv_n, seed,
                                    pool)
            float(np.asarray(seed))
            return time.perf_counter() - t0

        res["int8_scan_qps_partial_exact"] = B / _marginal(pchain)
        res["partial_selector_equal"] = True
        iidx.selector = "topk"
    else:
        res["partial_selector_equal"] = False
    from metagenome_vector_sketches_tpu.ann import int_index as _ii
    walls, stages = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        D_int, I_int = iidx.search(Qi, k)
        walls.append(time.perf_counter() - t0)
        stages.append(dict(_ii.LAST_SEARCH_STAGES))
    med = int(np.argsort(walls)[len(walls) // 2])
    res["int8_full_qps"] = B / float(np.median(walls))
    # per-stage split of the served wall (VERDICT r4 #1): device_d2h_ms is
    # the ONE packed host read (scan + transfer of B*pool*(1+P) int32s);
    # with the separately-measured scan marginal and the tunnel bandwidth
    # probe (main()), the residual attributes to the tunnel D2H floor
    res["int8_search_stages"] = {
        key: (round(val, 2) if key.endswith("_ms") else val)
        for key, val in stages[med].items()}
    res["int8_search_stages"]["scan_ms_marginal"] = round(dt_int * 1e3, 2)
    res["int8_self_in_topk"] = float(
        np.mean([b in set(I_int[b].tolist()) for b in range(B)]))
    return res


def bench_e2e_pairwise(N=65536, d=2048, n_clusters=32768, tile=2048, seed=4):
    """Honest END-TO-END shard production (VERDICT r1 item 3): synthetic
    clustered db -> full compute_pairwise_shard (staging + sweep +
    extraction + exact host finalize + shard write), with the per-stage
    split from matrix.compute.LAST_STAGES.

    Note for reading the numbers on the tunneled bench chip: each
    device->host transfer pays ~45 ms fixed latency plus ~22 MB/s
    (measured r3), so the fused-extract stage carries transfer overhead a
    locally-attached TPU host would not see; compute/write stages are
    representative.
    """
    import shutil
    import tempfile
    from metagenome_vector_sketches_tpu.io.dbfolder import DbFolder
    from metagenome_vector_sketches_tpu.matrix import compute as mc

    # clustered magnitude-realistic int32 sketch-like vectors, host-made
    # (projection throughput is measured separately; this block times the
    # pairwise engine). ~2 members/cluster -> ~3e5 surviving pairs. The
    # generator is shared with benchmarks/scale_test.py.
    from benchmarks.scale_test import synth_vectors_host
    V, _ = synth_vectors_host(N, d, n_clusters=n_clusters, seed=seed)
    tmp = tempfile.mkdtemp(prefix="mvs_e2e_")
    walls = []
    try:
        db = DbFolder.write(os.path.join(tmp, "db"),
                            [f"A{i:07d}" for i in range(N)], V, d)
        # best-of-2: the tunneled chip's dispatch/D2H latency drifts by
        # orders of magnitude run-to-run (chip phase); the db stays staged
        # on device across trials, like a multi-shard production run
        st_cold = None
        for trial in range(2):
            out_dir = os.path.join(tmp, f"m{trial}")
            t0 = time.perf_counter()
            mc.compute_pairwise_shard(db.path, out_dir,
                                      tile_rows=tile, verbose=False)
            walls.append(time.perf_counter() - t0)
            if trial == 0:
                st_cold = dict(mc.LAST_STAGES)
            if walls[-1] == min(walls):
                st = dict(mc.LAST_STAGES)
        wall = min(walls)
    finally:
        mc.clear_device_cache()
        shutil.rmtree(tmp, ignore_errors=True)
    out = {"N": N, "d": d, "tile": tile,
           "mode": st.get("mode"),
           "e2e_wall_s": round(wall, 2),
           "e2e_walls_s": [round(w, 2) for w in walls],
           "pairs_per_sec_e2e": round(float(N) * N / wall, 1),
           "candidates": int(st.get("candidates", 0)),
           "pairs_written": int(st.get("pairs_written", 0))}
    for k in ("stage_ms", "sweep_ms", "extract_ms", "finalize_ms",
              "write_ms", "stage_decompose_ms", "stage_h2d_ms"):
        out[k] = round(float(st.get(k, 0.0)), 1)
    # cold-start attribution (VERDICT r3 next #3): the FIRST trial's split
    # explains the cold wall — staging decompose (host, 1 vCPU) vs H2D vs
    # the first fused dispatch (which carries the remote program compiles)
    def _dispatch_fields(stt, dst):
        walls = stt.get("dispatch_walls_ms") or []
        if walls:
            dst["dispatch_first_ms"] = walls[0]
            dst["dispatch_rest_median_ms"] = \
                round(float(np.median(walls[1:])), 1) if len(walls) > 1 \
                else None
            dst["dispatch_count_recorded"] = len(walls)

    _dispatch_fields(st, out)
    if st_cold is not None:
        cold = {k: round(float(st_cold.get(k, 0.0)), 1)
                for k in ("stage_ms", "stage_decompose_ms", "stage_h2d_ms",
                          "extract_ms", "finalize_ms", "write_ms")}
        _dispatch_fields(st_cold, cold)
        cold["wall_s"] = round(walls[0], 2)
        out["cold"] = cold
    return out


def bench_matrix_reads(N=20000, neighbors=12, B=5000, seed=6):
    """Host-side matrix top-k read throughput (the reference's query serving
    path): batched native row decode over a synthetic N-row shard."""
    import shutil
    import tempfile
    from metagenome_vector_sketches_tpu.matrix import writer
    from metagenome_vector_sketches_tpu.matrix.reader import MatrixReader

    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(N), neighbors)
    cols = (rows + np.tile(np.arange(neighbors), N) * 7) % N
    key = np.unique(rows * N + cols)
    rows, cols = key // N, key % N
    vals = rng.integers(1, 10**9, size=len(rows)).astype(np.int64)
    ns = rng.uniform(1e3, 1e5, size=N)
    tmp = tempfile.mkdtemp(prefix="mvs_read_")
    try:
        writer.write_shard(os.path.join(tmp, "shard_0"), rows, cols, vals,
                           ns, 2048)
        reader = MatrixReader(tmp)
        qrows = rng.integers(0, N, size=B).tolist()
        reader.load_neighbors_for_rows(qrows[:16], N)  # warm mmap/index
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            reader.load_neighbors_for_rows(qrows, N)
            best = min(best, time.perf_counter() - t0)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return {"queries_per_sec": round(B / best, 1), "N": N, "B": B,
            "neighbors_per_row": neighbors}


def bench_conformance():
    """On-chip correctness certification (VERDICT r2 item 5): the toy db's
    decoded shard triples must equal the exact float64 oracle ON THE BENCH
    BACKEND (the real TPU when available — tests/ force CPU, so without
    this block no per-round artifact certifies chip correctness). The
    pallas_eq_xla half comes from bench_pairwise's count assertion."""
    import shutil
    import tempfile
    from metagenome_vector_sketches_tpu.io.dbfolder import DbFolder
    from metagenome_vector_sketches_tpu.matrix import compute as mc
    from metagenome_vector_sketches_tpu.matrix.reader import MatrixReader
    from metagenome_vector_sketches_tpu.matrix.writer import quantize_jaccard

    here = os.path.dirname(os.path.abspath(__file__))
    toy = os.path.join(here, "tests", "fixtures", "ref_toy", "toy_db_256")
    out = {"toy_oracle": False}
    tmp = tempfile.mkdtemp(prefix="mvs_conf_")
    try:
        db = DbFolder(toy)
        V = db.load_vectors().astype(np.int32)
        _, norms = db.names_and_norms()
        ns = norms * norms
        n, d = V.shape
        mc.compute_pairwise_shard(toy, os.path.join(tmp, "m"),
                                  tile_rows=64, verbose=False)
        er, ec, ev = mc.compute_pairwise_oracle(V, ns, d)
        eq = quantize_jaccard(ev, er, ec, ns, d)
        rr, cc, qq = MatrixReader(os.path.join(tmp, "m")).decode_all_triples(n)
        out["toy_oracle"] = set(zip(rr.tolist(), cc.tolist(), qq.tolist())) \
            == set(zip(er.tolist(), ec.tolist(), eq.tolist()))
        out["toy_pairs"] = int(len(rr))
    except Exception as e:  # pragma: no cover - must never kill the bench
        out["error"] = str(e)[:200]
    finally:
        mc.clear_device_cache()
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def bench_compile_cache(small: bool = False):
    """Cross-process compile-cache demonstration (VERDICT r4 #3): run the
    pairwise engine in THREE fresh subprocesses on the SAME program shape
    and record each first-dispatch wall. proc1 and proc2 share a FRESH
    temporary jax compilation-cache dir (so proc1 is cold by construction
    and proc2's speedup can only come from that local persistent cache);
    proc3 runs with MVS_TPU_NO_COMPILE_CACHE=1 to isolate the local cache
    from any server-side caching on the remote-compile endpoint. The shape
    (d rotated per wall-clock hour, never 2048) dodges server-side hits on
    production shapes. If utils/compilecache.py works through the endpoint,
    proc2's dispatch_first_ms collapses toward the warm dispatch; if the
    endpoint bypasses it, proc2 == proc1 and the array-job deployment (one
    process per shard, pairwise_comp_optimized.cpp:938-941) pays a compile
    per job. A third MVS_TPU_NO_COMPILE_CACHE control was run once (r5):
    it exceeded its 900 s timeout while the cached proc took 1.0 s — the
    cold-on-empty-dir proc1 IS that control by construction, so the bench
    keeps two procs (each proc costs real tunnel-minutes)."""
    import shutil
    import subprocess
    import tempfile
    here = os.path.dirname(os.path.abspath(__file__))
    probe = os.path.join(here, "tools", "compile_cache_probe.py")
    nonce = int(time.time() // 3600)
    if small:
        N, tile = 768, 256
        d = 256 + 128 * (nonce % 4)               # 256..640, never 2048
    else:
        N, tile = 1536, 512
        d = [1408, 1536, 1664, 1792, 1920, 2176, 2304][nonce % 7]
    out = {"N": N, "d": d, "tile": tile}
    cache_dir = tempfile.mkdtemp(prefix="mvs_cc_cache_")
    base_env = dict(os.environ)
    if small:
        base_env["MVS_BENCH_FORCE_CPU"] = "1"
    plans = [("proc1_cold", {"JAX_COMPILATION_CACHE_DIR": cache_dir}),
             ("proc2_cached", {"JAX_COMPILATION_CACHE_DIR": cache_dir})]
    try:
        for tag, extra in plans:
            env = dict(base_env)
            env.update(extra)
            try:
                p = subprocess.run(
                    [sys.executable, probe, str(N), str(d), str(tile)],
                    timeout=900, capture_output=True, text=True, env=env)
                line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() \
                    else ""
                out[tag] = json.loads(line) if line.startswith("{") else {
                    "error": (p.stderr or "no output")[-200:]}
            except Exception as err:  # pragma: no cover - keep bench alive
                out[tag] = {"error": str(err)[:200]}
    finally:
        shutil.rmtree(cache_dir, ignore_errors=True)
    try:
        f1 = out["proc1_cold"]["dispatch_first_ms"]
        f2 = out["proc2_cached"]["dispatch_first_ms"]
        out["speedup_vs_cold"] = round(f1 / f2, 2)
        # first dispatch also pays H2D + real execution, so the cached
        # floor is not ~0; "hit" = the compile component clearly vanished
        out["cross_process_hit"] = bool(f2 < 0.5 * f1)
    except (KeyError, TypeError, ZeroDivisionError):
        pass
    return out


def _dispatch_rtt_ms() -> float:
    """One warm tiny-dispatch round trip (program enqueue + scalar read) —
    the fixed per-dispatch cost every serving number below pays through
    the tunnel."""
    import jax
    import jax.numpy as jnp
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8, 128), jnp.float32)
    float(np.asarray(f(x))[0, 0])            # compile + warm
    t0 = time.perf_counter()
    float(np.asarray(f(x))[0, 0])
    return round((time.perf_counter() - t0) * 1e3, 1)


def _load_json_extra(here: str, fname: str, key: str) -> dict:
    """Embed a persisted measurement file into extras (absent -> {})."""
    try:
        with open(os.path.join(here, fname)) as f:
            return {key: json.load(f)}
    except (OSError, ValueError):
        return {}


def _backend_is_reachable(timeout_s: int = 240) -> bool:
    """Probe backend init in a SUBPROCESS: the axon plugin's init blocks
    indefinitely when its tunnel is unreachable, which would hang the whole
    bench (and leave the round without an artifact) at the first
    jax.devices() call."""
    import subprocess
    try:
        p = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices(); print('ok')"],
            timeout=timeout_s, capture_output=True, text=True)
        return p.returncode == 0 and "ok" in p.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BASELINE_MEASURED.json")) as f:
        base = json.load(f)
    baseline_pps = base["pairwise_d2048"]["pairs_per_sec"]
    baseline_proj = base["projection_d2048"]["hashes_per_sec"]

    import jax
    tpu_unavailable = False
    last_onchip = None
    if not _backend_is_reachable():
        jax.config.update("jax_platforms", "cpu")
        tpu_unavailable = True
        # carry the most recent real-chip measurements into the round
        # artifact so a tunnel outage at bench time doesn't erase them
        try:
            with open(os.path.join(here, "BENCH_ONCHIP_LAST.json")) as f:
                last_onchip = json.load(f)
        except OSError:
            pass
    if jax.default_backend() == "cpu":
        # keep the fallback benchmark finite on a CPU-only host
        pps, pair_extras = bench_pairwise(N=2048, tile=1024, reps=3)
        proj = bench_projection(B=8, H=1024)
        topk = bench_topk(N=8192, B=32)
        e2e = bench_e2e_pairwise(N=4096, d=256, n_clusters=2048, tile=512)
    else:
        pps, pair_extras = bench_pairwise()
        proj = bench_projection()
        topk = bench_topk()
        e2e = bench_e2e_pairwise()
        # the production-scale headline: quarter-million rows, 6.9e10 pairs
        try:
            e2e["N262k"] = bench_e2e_pairwise(N=262144, n_clusters=131072)
        except Exception as err:  # pragma: no cover
            e2e["N262k_error"] = str(err)[:200]

    conf = bench_conformance()
    if "pallas_eq_xla" in pair_extras:
        conf["pallas_eq_xla"] = pair_extras["pallas_eq_xla"]

    result = {
        "metric": "pairwise_sims_per_sec_per_chip_d2048",
        "value": round(pps, 1),
        "unit": "pairs/s",
        "vs_baseline": round(pps / baseline_pps, 2),
        "extras": {
            "backend": jax.default_backend(),
            "tpu_unavailable": tpu_unavailable,
            # chip-phase context for every number below: the tunnel's
            # per-dispatch round trip drifts ~28 ms .. ~3.6 s day-to-day
            "dispatch_rtt_ms": _dispatch_rtt_ms(),
            **({"last_onchip": last_onchip} if last_onchip else {}),
            "device": str(jax.devices()[0]),
            "conformance": conf,
            "pairwise": pair_extras,
            "projection": {**{k: round(v, 1) if isinstance(v, float) else v
                              for k, v in proj.items()},
                           "vs_baseline": round(proj["hashes_per_sec"] / baseline_proj, 2)},
            "flat_ip_topk": {k: round(v, 1) if isinstance(v, float) else v
                             for k, v in topk.items()},
            "e2e_pairwise": e2e,
            "matrix_reads": bench_matrix_reads(),
            # production row density (VERDICT r3 item 6): server matrix
            # rows carry hundreds of neighbors (README.md:111 scale)
            "matrix_reads_dense": bench_matrix_reads(N=20000,
                                                     neighbors=400,
                                                     B=2000),
            "compile_cache": bench_compile_cache(
                small=jax.default_backend() == "cpu"),
            # whole-pipeline chip run (hashes in -> neighbors out) is
            # minutes-long; benchmarks/full_pipeline.py persists its last
            # result rather than re-running inside every bench
            **_load_json_extra(here, "FULL_PIPELINE_LAST.json",
                               "full_pipeline"),
        },
    }
    print(json.dumps(result))
    if not tpu_unavailable and jax.default_backend() == "tpu":
        # persist the freshest real-chip measurements so a tunnel outage
        # at a later bench time can still carry them into the artifact
        try:
            with open(os.path.join(here, "BENCH_ONCHIP_LAST.json"),
                      "w") as f:
                json.dump(result, f)
        except OSError:
            pass


if __name__ == "__main__":
    main()
