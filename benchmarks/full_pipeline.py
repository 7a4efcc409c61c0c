"""One whole-pipeline run at production scale (VERDICT r4 #7).

The reference's de-facto integration recipe (README.md:44-168) is:
all_hashes.txt -> project_everything sketch -> pairwise_comp shards ->
query_pc_mat neighbors. This harness runs that END TO END in one session
on the real chip and reports ONE wall a user can quote for "hashes in,
neighbors out", plus the per-stage split:

  harness (excluded): synthesize hash sets with planted neighbor groups
      and write all_hashes.txt (the reference pipeline STARTS at this file)
  parse      - io.hashes.parse_hashes_file          (host)
  project    - ops.projection.project_device_many   (device)
  db_write   - io.dbfolder.DbFolder.write           (host)
  pairwise   - matrix.compute.compute_pairwise_shard (device engine,
               per-stage LAST_STAGES split embedded)
  query      - query.engine.query over sampled planted rows (host reader)
  validate (excluded): stream_scale.spot_check row oracle + planted-
      neighbor recall; both must pass for ok=true

Data model: groups of 4 accessions share 160 of their 256 FracMinHash-style
hashes (pair Jaccard ~0.45, comfortably above the retention threshold
J ~ 0.0526, pairwise_comp_optimized.cpp:139-141); the rest are background
singletons (J ~ 0) and the last `n_heavy` accessions carry 2048 hashes so
max_component exceeds 127 and the engine runs the production 2-limb plane
decomposition, as a large-genome tail does at the reference's N >= 7e5
deployment scale (query_ava_matrix.cpp:280,598).

Run: python benchmarks/full_pipeline.py [N] [d] [workdir]
Writes /root/repo/FULL_PIPELINE_LAST.json (embedded in bench.py's artifact).
A `workdir` makes the run resumable through tunnel-phase timeouts: the
synthesized all_hashes.txt and the projected db folder are reused when
present (their stage times then read 0 and `resumed` lists what was
skipped — the pipeline_wall of a resumed run is NOT the quotable number;
rerun clean for that).
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GROUP = 4
BASE_HASHES = 256
SHARED = 160
HEAVY_HASHES = 2048


def synth_hashes_file(path, N, n_groups, n_heavy, seed=7):
    """Plant n_groups groups of GROUP rows sharing SHARED hashes; write the
    all_hashes.txt exactly in the library's on-disk format (io/hashes.py)."""
    rng = np.random.default_rng(seed)
    grouped = n_groups * GROUP
    assert grouped + n_heavy <= N
    with open(path, "w") as f:
        for g in range(n_groups):
            shared = rng.integers(0, 2**63, size=SHARED, dtype=np.uint64)
            for m in range(GROUP):
                priv = rng.integers(0, 2**63, size=BASE_HASHES - SHARED,
                                    dtype=np.uint64)
                row = np.sort(np.concatenate([shared, priv]))
                f.write(f"ACC{g * GROUP + m:07d}: "
                        + " ".join(map(str, row.tolist())) + "\n")
        for i in range(grouped, N):
            n_h = HEAVY_HASHES if i >= N - n_heavy else BASE_HASHES
            row = np.sort(rng.integers(0, 2**63, size=n_h, dtype=np.uint64))
            f.write(f"ACC{i:07d}: " + " ".join(map(str, row.tolist())) + "\n")


def main():
    if os.environ.get("MVS_BENCH_FORCE_CPU"):
        # JAX_PLATFORMS alone is ignored: the axon plugin force-selects
        # itself at interpreter start (see CLAUDE.md)
        import jax
        jax.config.update("jax_platforms", "cpu")
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    n_groups = max(1, N // 64)
    n_heavy = max(1, N // 128)
    n_query = min(1024, n_groups * GROUP)
    from metagenome_vector_sketches_tpu.io.hashes import parse_hashes_file
    from metagenome_vector_sketches_tpu.io.ingest import project_hash_lines
    from metagenome_vector_sketches_tpu.io.dbfolder import DbFolder
    from metagenome_vector_sketches_tpu.matrix import compute as mc
    from metagenome_vector_sketches_tpu.query import engine as qe
    from benchmarks.stream_scale import spot_check

    workdir = sys.argv[3] if len(sys.argv) > 3 else None
    tmp = workdir or tempfile.mkdtemp(prefix="mvs_pipeline_", dir="/tmp")
    if workdir:
        os.makedirs(tmp, exist_ok=True)
    out = {"N": N, "d": d, "n_groups": n_groups, "n_heavy": n_heavy,
           "base_hashes": BASE_HASHES, "shared": SHARED,
           "heavy_hashes": HEAVY_HASHES}
    resumed = []
    stages = {}
    try:
        hashes_path = os.path.join(tmp, "all_hashes.txt")
        db_path = os.path.join(tmp, "db")
        db_done = os.path.exists(os.path.join(db_path, "dtype.txt"))
        if os.path.exists(hashes_path):
            out["harness_gen_s"] = 0.0
            resumed.append("gen")
        else:
            t0 = time.perf_counter()
            # write-then-rename: a run killed mid-synth must NOT leave a
            # truncated file that a workdir resume would treat as complete
            synth_hashes_file(hashes_path + ".tmp", N, n_groups, n_heavy)
            os.rename(hashes_path + ".tmp", hashes_path)
            out["harness_gen_s"] = round(time.perf_counter() - t0, 2)
        out["hashes_file_mb"] = round(os.path.getsize(hashes_path) / 1e6, 1)

        print(f"[pipeline] hashes file ready ({out['hashes_file_mb']} MB, "
              f"gen {out['harness_gen_s']} s)", file=sys.stderr, flush=True)

        if db_done:
            # resume: the db folder already holds the projected vectors
            stages["parse_s"] = stages["project_s"] = \
                stages["db_write_s"] = 0.0
            resumed += ["parse", "project", "db_write"]
            db = DbFolder(db_path)
            assert db.num_vectors == N and db.dimension == d, \
                f"stale workdir db: {db.num_vectors}x{db.dimension}"
            names, _ = db.names_and_norms()
            names = list(names)
        else:
            t0 = time.perf_counter()
            named = parse_hashes_file(hashes_path)
            stages["parse_s"] = round(time.perf_counter() - t0, 2)
            print(f"[pipeline] parse {stages['parse_s']} s",
                  file=sys.stderr, flush=True)
            names = [n for n, _ in named]
            sets_ = [h for _, h in named]
            out["total_hashes"] = int(sum(len(s) for s in sets_))

            t0 = time.perf_counter()
            vectors = project_hash_lines(sets_, d, device="device")
            stages["project_s"] = round(time.perf_counter() - t0, 2)
            print(f"[pipeline] project {stages['project_s']} s",
                  file=sys.stderr, flush=True)
            del named, sets_

            t0 = time.perf_counter()
            db = DbFolder.write(db_path, names, vectors, d)
            stages["db_write_s"] = round(time.perf_counter() - t0, 2)
            print(f"[pipeline] db_write {stages['db_write_s']} s",
                  file=sys.stderr, flush=True)
            out["max_component"] = int(np.abs(vectors).max())
            del vectors

        mat = os.path.join(tmp, "mat")
        if os.path.exists(mat):
            shutil.rmtree(mat)  # partial shard from a timed-out run
        t0 = time.perf_counter()
        mc.compute_pairwise_shard(db.path, mat, verbose=False)
        stages["pairwise_s"] = round(time.perf_counter() - t0, 2)
        print(f"[pipeline] pairwise {stages['pairwise_s']} s",
              file=sys.stderr, flush=True)
        out["pairwise_stages"] = {
            k: (round(v, 3) if isinstance(v, float) else v)
            for k, v in mc.LAST_STAGES.items()
            if isinstance(v, (int, float))}
        out["pairs_per_sec"] = round(
            N * (N + 1) / 2 / stages["pairwise_s"], 1)

        _, norms = db.names_and_norms()
        rng = np.random.default_rng(3)
        qrows = sorted(int(r) for r in rng.choice(
            n_groups * GROUP, size=n_query, replace=False))
        t0 = time.perf_counter()
        results = qe.query(mat, qrows, norms, names)
        stages["query_s"] = round(time.perf_counter() - t0, 2)
        out["query_qps"] = round(n_query / stages["query_s"], 1)

        # planted recall: each grouped row must report its 3 group mates
        found = 0
        for row, res in zip(qrows, results):
            g = row // GROUP
            mates = {f"ACC{g * GROUP + m:07d}" for m in range(GROUP)} \
                - {f"ACC{row:07d}"}
            found += len(mates & set(res.neighbor_ids))
        out["planted_recall"] = round(found / (3 * n_query), 4)

        t0 = time.perf_counter()
        out["spot_check_ok"] = bool(spot_check(db.path, mat, N, d, n_rows=3))
        out["validate_s"] = round(time.perf_counter() - t0, 2)

        out["stages"] = stages
        if resumed:
            out["resumed"] = resumed
        out["pipeline_wall_s"] = round(sum(stages.values()), 2)
        out["ok"] = bool(out["spot_check_ok"]
                         and out["planted_recall"] == 1.0)
        import jax
        out["backend"] = jax.default_backend()
    finally:
        if not workdir:
            shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # resumed runs skip stages (their wall is not the quotable number) —
    # never let one clobber a clean run's persisted artifact
    fname = "FULL_PIPELINE_LAST.json" if not resumed else \
        "FULL_PIPELINE_RESUMED.json"
    with open(os.path.join(here, fname), "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
