"""ANN at production scale (VERDICT r1 item 9 / BASELINE.json "100k+
accessions" config): flat-IP index build + batched top-k search and the
adaptive expanding pipeline at N=1,048,576 x d=2048 on the real chip,
with recall of the approx_max_k path verified against the exact search.

TPU-first construction: the database is generated and L2-normalized ON
DEVICE (FlatIPIndex.from_device_chunks) — nothing crosses the host except
the (B, k) results. Search throughput is the marginal time of a
data-dependent chain of searches ending in one tiny host read, so the
tunnel's dispatch/D2H latency doesn't pollute the device number.

Run: python benchmarks/ann_scale.py [N] [d] [B] [k]
Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 50

    import functools
    import jax
    import jax.numpy as jnp
    from metagenome_vector_sketches_tpu.ann.flat_index import FlatIPIndex

    out = {"N": N, "d": d, "B": B, "k": k,
           "backend": jax.default_backend()}

    @functools.partial(jax.jit, static_argnames=("rows", "dd"))
    def synth_chunk(key, rows, dd):
        v = jax.random.normal(key, (rows, dd), dtype=jnp.float32)
        inv = jax.lax.rsqrt(jnp.maximum(
            jnp.sum(v * v, axis=1, keepdims=True), 1e-30))
        return v * inv

    CHUNK = 65536
    t0 = time.perf_counter()
    keys = jax.random.split(jax.random.PRNGKey(0), (N + CHUNK - 1) // CHUNK)
    chunks = []
    s = 0
    while s < N:
        rows = min(CHUNK, N - s)
        chunks.append((s, synth_chunk(keys[len(chunks)], rows, d)))
        s += rows
    jax.block_until_ready([c for _, c in chunks])
    out["build_on_device_s"] = round(time.perf_counter() - t0, 2)
    out["index_bytes"] = int(N * d * 4)

    index = FlatIPIndex.from_device_chunks(chunks, d)

    # queries: noisy copies of rows from the first chunk
    qkey = jax.random.PRNGKey(7)
    base_rows = chunks[0][1][:B]
    noise = 0.02 * jax.random.normal(qkey, (B, d), dtype=jnp.float32)
    q = base_rows + noise
    q = q * jax.lax.rsqrt(jnp.maximum(jnp.sum(q * q, axis=1,
                                              keepdims=True), 1e-30))
    q = jax.block_until_ready(q)

    def timed_search(recall):
        index.recall_target = recall

        def chain(n):
            t0 = time.perf_counter()
            seed = jnp.float32(0)
            D = I = None
            for _ in range(n):
                D, I = index.search_device(q + seed * 0, k)
                seed = D[0, 0]
            float(np.asarray(seed))
            return time.perf_counter() - t0, I

        chain(1)  # compile + warm
        margins = []
        I = None
        for _ in range(3):
            d1, _ = chain(1)
            dn, I = chain(4)
            margins.append((dn - d1) / 3)
        good = [m for m in margins if m > 0] or margins
        return np.asarray(I), float(np.median(good))

    I_exact, w_exact = timed_search(1.0)
    out["exact_qps"] = round(B / w_exact, 1)
    out["exact_batch_s"] = round(w_exact, 4)
    I_appr, w_appr = timed_search(0.95)
    out["approx95_qps"] = round(B / w_appr, 1)
    hits = sum(len(set(I_appr[b]) & set(I_exact[b])) for b in range(B))
    out["approx95_recall_at_k"] = round(hits / (B * k), 4)

    # bf16-stored stack + 4k candidate pool + f32-math rescoring: the
    # serving-speed mode. EVERY f32 reference must drop first (the store
    # cast frees originals chunk by chunk; both copies cannot fit HBM at
    # N=1M): the exact index shares the chunk tuples, and store='bf16'
    # consumes the passed list in place.
    index._device_chunks = None
    index = FlatIPIndex.from_device_chunks(chunks, d, store="bf16")
    assert len(chunks) == 0          # consumed
    I_bf, w_bf = timed_search(1.0)
    out["bf16_rescore_qps"] = round(B / w_bf, 1)
    hits = sum(len(set(I_bf[b]) & set(I_exact[b])) for b in range(B))
    out["bf16_rescore_recall_at_k"] = round(hits / (B * k), 4)

    # self-neighbor sanity: each noisy query's source row in the exact top-k
    out["self_in_topk"] = round(
        float(np.mean([b in set(I_exact[b].tolist()) for b in range(B)])), 3)

    # adaptive expanding pipeline (reference jaccard.py:120-174 semantics)
    from metagenome_vector_sketches_tpu.ann.search import adaptive_search
    rng = np.random.default_rng(3)
    norms = rng.uniform(40.0, 80.0, size=N)  # plausible |A|~1.6k-6.4k norms
    nq = 32
    # query norms must live on the db-norm scale for the jaccard
    # estimate to clear j (norm^2 ~ |set|): scale the unit queries
    Qh = np.asarray(q[:nq]).astype(np.float64) * 60.0
    t0 = time.perf_counter()
    hits_a, qn = adaptive_search(index, Qh, j=0.5, verbose=False,
                                 db_norms=norms)
    out["adaptive_wall_s"] = round(time.perf_counter() - t0, 2)
    out["adaptive_queries"] = nq
    out["adaptive_hits"] = len(hits_a)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
