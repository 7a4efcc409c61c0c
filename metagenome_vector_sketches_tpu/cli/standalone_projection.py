"""standalone_projection: lines of whitespace-separated hashes on a file ->
one projected vector per line on stdout, floats space-separated
(reference: src/standalone_projection.cpp:11-46)."""

from __future__ import annotations

import sys

import numpy as np


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        print("Usage: standalone_projection <hashes_file> <dimension>",
              file=sys.stderr)
        return 1
    filename, d = argv[0], int(argv[1])
    lines = []
    with open(filename) as f:
        for line in f:
            vals = line.split()
            lines.append(np.unique(np.array(vals, dtype=np.uint64)) if vals
                         else np.empty(0, dtype=np.uint64))
    from ..io.ingest import project_hash_lines
    vecs = project_hash_lines(lines, d)
    out = sys.stdout
    for row in vecs:
        # reference prints static_cast<float>(int) via operator<< (%.6g)
        out.write(" ".join(f"{float(np.float32(x)):g}" for x in row))
        out.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
