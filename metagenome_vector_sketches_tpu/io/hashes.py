"""The ``all_hashes.txt`` contract: one ``<accession>: h1 h2 ...`` line per
accession (reference writer src/project_everything.cpp:222-228, parser
:258-281; also the query input format of jaccard.py search, jaccard.py:75-94).
"""

from __future__ import annotations

import numpy as np


def write_hashes_file(path: str, named_sets) -> None:
    """Write (name, hash-iterable) pairs. Hashes are written sorted for
    determinism (the reference emits unordered_set order; consumers re-set
    them, so ordering is not load-bearing)."""
    with open(path, "w") as f:
        for name, hashes in named_sets:
            body = " ".join(map(str, sorted(int(x) for x in hashes)))
            f.write(f"{name}: {body}\n" if body else f"{name}:\n")


def parse_hashes_file(path: str) -> list[tuple[str, np.ndarray]]:
    """Parse into (name, sorted unique uint64 array) pairs, line order kept."""
    out = []
    with open(path) as f:
        for line in f:
            colon = line.find(":")
            if colon < 0:
                continue
            name = line[:colon]
            rest = line[colon + 1:].split()
            arr = np.unique(np.array(rest, dtype=np.uint64)) if rest else \
                np.empty(0, dtype=np.uint64)
            out.append((name, arr))
    return out


def parse_query_hashes_file(path: str) -> tuple[list[str], list[np.ndarray]]:
    """jaccard.py-search-style strict parse: every non-empty line must be
    '<id>: hashes' (reference jaccard.py:75-94 exits on malformed lines)."""
    names, sets_ = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            parts = line.split(":")
            if len(parts) != 2:
                raise ValueError(f"malformed query line in {path}: {line[:40]!r}")
            names.append(parts[0].strip())
            rest = parts[1].split()
            # the reference dedups query hashes through an unordered_set
            # (jaccard.py -> standalone_projection.cpp:29-33); a duplicated
            # hash must not contribute its +-1 pattern twice
            sets_.append(np.unique(np.array(rest, dtype=np.uint64)) if rest
                         else np.empty(0, dtype=np.uint64))
    return names, sets_
