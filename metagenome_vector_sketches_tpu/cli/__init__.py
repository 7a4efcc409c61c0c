"""Command-line frontends with the reference binaries' flag surfaces:
project_everything (convert/sketch), standalone_projection, pairwise_comp,
query_pc_mat, jaccard (index/search), read_pc_mat."""
