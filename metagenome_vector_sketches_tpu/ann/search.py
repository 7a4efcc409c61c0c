"""Adaptive expanding ANN search (reference jaccard.py:63-224).

Query hash sets are projected with the same seeded kernel as the database,
scaled by 1/sqrt(d) and L2-normalized; the flat index is searched with an
expanding k = 50 * 3^i schedule: queries whose k-th inner product is still
above the threshold 2j/(1+j) are re-searched at a deeper level (skipping a
level when the margin exceeds 0.05 — the reference's estimate heuristic),
capped at 50*3^19. Hits are rescored to exact-form Jaccard
ip*|q||n| / (|n|^2 + |q|^2 - ip*|q||n|), filtered > j, sorted descending.
"""

from __future__ import annotations

import os

import numpy as np

from ..io.dbfolder import DbFolder
from ..io.hashes import parse_query_hashes_file
from .flat_index import FlatIPIndex, normalize_l2

INITIAL_NB_SEARCHES = 50
MAX_LEVELS = 20  # 50 * 3^19 hard cap (jaccard.py:129)


def project_queries(hash_sets, dimension: int) -> np.ndarray:
    """Hash sets -> float64 (n, d) query vectors scaled by 1/sqrt(d)
    (jaccard.py:96-118: standalone_projection output / sqrt(d))."""
    from ..io.ingest import project_hash_lines
    vecs = project_hash_lines(list(hash_sets), dimension).astype(np.float64)
    return vecs / np.sqrt(dimension)


def adaptive_search(index: FlatIPIndex, queries_f64: np.ndarray, j: float,
                    verbose: bool = True):
    """-> (D_all, I_all, query_norms): expanded search state, reference
    semantics (jaccard.py:120-174)."""
    queries = queries_f64.astype(np.float32)
    query_norms = np.linalg.norm(queries, axis=1)
    queries = normalize_l2(queries)
    min_ip = 2 * j / (1 + j)

    remaining = [np.arange(len(queries))] + [[] for _ in range(MAX_LEVELS - 1)]
    D_all = np.zeros((len(queries), INITIAL_NB_SEARCHES), dtype=np.float32)
    I_all = np.full((len(queries), INITIAL_NB_SEARCHES), -1, dtype=np.int32)

    for level in range(MAX_LEVELS):
        if len(remaining[level]) == 0:
            continue
        qidx = np.asarray(remaining[level])
        nb = INITIAL_NB_SEARCHES * 3 ** level
        if verbose:
            print(f"Searching {nb} : ", qidx)
        if D_all.shape[1] < nb:
            D_new = np.zeros((D_all.shape[0], nb), dtype=np.float32)
            I_new = np.full((I_all.shape[0], nb), -1, dtype=np.int32)
            D_new[:, :D_all.shape[1]] = D_all
            I_new[:, :I_all.shape[1]] = I_all
            D_all, I_all = D_new, I_new
        D, I = index.search(queries[qidx], nb)
        D_all[qidx, :] = D
        I_all[qidx, :] = I
        for row, q in enumerate(qidx):
            if np.any(D[row] > min_ip) and D[row, -1] > min_ip:
                # estimate how much deeper to go (jaccard.py:162-167)
                if D[row, -1] - 0.05 > min_ip and level <= MAX_LEVELS - 3:
                    remaining[level + 2].append(q)
                elif level <= MAX_LEVELS - 2:
                    remaining[level + 1].append(q)
    return D_all, I_all, query_norms


def rescore(D_all: np.ndarray, I_all: np.ndarray, query_norms: np.ndarray,
            names: list[str], norms: np.ndarray, j: float,
            verbose: bool = True):
    """Exact-form Jaccard rescoring + filter + sort (jaccard.py:197-224).
    Returns [(query_idx, neighbor_id, jaccard), ...]."""
    out = []
    for i in range(len(I_all)):
        qn = float(query_norms[i])
        if qn == 0:
            continue
        results = []
        for rank, idx in enumerate(I_all[i]):
            if idx == -1:
                continue
            nid = names[idx]
            nn = float(norms[idx])
            ip = float(D_all[i, rank])
            jac = ip * qn * nn / (nn ** 2 + qn ** 2 - ip * qn * nn)
            if jac > j:
                results.append((nid, jac, ip, nn, qn))
        results.sort(key=lambda x: x[1], reverse=True)
        if verbose:
            print(f"Query {i}:")
        for rank, (nid, jac, ip, nn, qn_) in enumerate(results):
            if verbose:
                print(f"  Neighbor {rank}: {nid} (jaccard: {jac:.4f}), "
                      f"inner_product: {ip:.4f} {nn} {qn_}")
            out.append((i, nid, jac))
    return out


def search_index(index_folder: str, query_file: str, j: float,
                 verbose: bool = True, recall_target: float = 1.0):
    """Full search pipeline over a db folder with a built faiss.index
    (reference search_index, jaccard.py:63-224). recall_target < 1.0 opts
    into the ~2x-faster approximate per-chunk top-k (no reference
    counterpart; rescoring stays exact)."""
    db = DbFolder(index_folder)
    d = db.dimension
    sample_names, hash_sets = parse_query_hashes_file(query_file)
    queries = project_queries(hash_sets, d)
    index = FlatIPIndex.load(os.path.join(index_folder, "faiss.index"))
    index.recall_target = recall_target
    D_all, I_all, query_norms = adaptive_search(index, queries, j, verbose)
    names, norms = db.names_and_norms()
    return rescore(D_all, I_all, query_norms, names, norms, j, verbose)
