"""Compute kernels: splitmix64 sign generation, random projection, pairwise
integer GEMM with threshold filtering, and fused dot+top-k."""
