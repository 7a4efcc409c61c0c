"""In-process sourmash ``.sig.zip`` reader.

The reference shells out to ``unzip``/``gunzip`` and hand-scans the JSON for
``"ksize"``/``"mins"`` (src/project_everything.cpp:73-151). We do the whole
thing in-process with zipfile + gzip + json — no subprocesses, no temp files —
and take the union of ``mins`` over every signature record with the requested
ksize (the reference ingests only ksize==31, src/project_everything.cpp:116).
"""

from __future__ import annotations

import gzip
import io
import json
import os
import zipfile


def accession_name(path: str) -> str:
    """Base name up to the first '.' of the file stem.

    Matches fs::path(file).stem() + substr(0, find('.')) in the reference
    (src/project_everything.cpp:163-164): "DRR000001.unitigs.fa.sig.zip"
    -> stem "DRR000001.unitigs.fa.sig" -> "DRR000001".
    """
    stem = os.path.basename(path)
    if stem.endswith(".zip"):
        stem = stem[:-4]
    return stem.split(".", 1)[0]


def read_sig_zip(path: str, ksize: int = 31) -> set[int]:
    """Extract the union of FracMinHash 'mins' at the given ksize."""
    hashes: set[int] = set()
    with zipfile.ZipFile(path) as zf:
        for member in zf.namelist():
            if not member.endswith(".sig.gz"):
                continue
            raw = zf.read(member)
            text = gzip.decompress(raw)
            records = json.loads(text)
            if isinstance(records, dict):
                records = [records]
            for rec in records:
                for sig in rec.get("signatures", []):
                    if sig.get("ksize") == ksize:
                        hashes.update(int(h) for h in sig.get("mins", []))
    return hashes


def iter_signature_files(folder: str):
    """Deterministic (sorted) listing of signature files in a folder.

    The reference uses raw directory-iteration order
    (src/project_everything.cpp:189-191), which is filesystem-dependent; we
    sort lexicographically so runs are reproducible. Downstream artifacts are
    keyed by vector_norms.txt line order, so this is self-consistent.
    """
    names = sorted(os.listdir(folder))
    for name in names:
        full = os.path.join(folder, name)
        if os.path.isfile(full):
            yield full
