"""Ingest and on-disk artifact contracts: sourmash sig.zip reading, hashes
files, and the db folder (vectors.bin / vector_norms.txt / dimension.txt /
dtype.txt)."""
