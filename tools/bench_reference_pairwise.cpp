// CPU baseline microbenchmark for the reference's pairwise hot loop shape:
// an Eigen int32 GEMM block_i^T * block_j followed by the threshold scan
// (the reference's compute_sparse_dot_products_optimized does exactly this;
// its binary cannot be built because the `bits` submodule is unpinned, so
// this standalone harness measures the same compute on synthetic data).
//
// Build: g++ -O2 -std=c++17 -fopenmp -I<eigen> tools/bench_reference_pairwise.cpp -o bench_ref
// Run:   ./bench_ref [N] [d] [chunk]   -> prints JSON {"pairs_per_sec": ...}

#include <Eigen/Dense>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

using namespace Eigen;

int main(int argc, char** argv) {
    int N = argc > 1 ? atoi(argv[1]) : 2048;
    int d = argc > 2 ? atoi(argv[2]) : 2048;
    int chunk = argc > 3 ? atoi(argv[3]) : 512;

    std::mt19937 rng(0);
    std::uniform_int_distribution<int> dist(-1500, 1500);
    MatrixXi all(d, N);
    for (int i = 0; i < N; ++i)
        for (int j = 0; j < d; ++j) all(j, i) = dist(rng);
    std::vector<double> norms(N);
    for (int i = 0; i < N; ++i) {
        double s = 0;
        for (int j = 0; j < d; ++j) s += double(all(j, i)) * all(j, i);
        norms[i] = s / d;
    }

    int64_t kept = 0;
    auto t0 = std::chrono::high_resolution_clock::now();
    for (int bi = 0; bi < N; bi += chunk) {
        int ei = std::min(bi + chunk, N);
        MatrixXi block_i = all.middleCols(bi, ei - bi);
        for (int bj = 0; bj < N; bj += chunk) {
            int ej = std::min(bj + chunk, N);
            MatrixXi block_j = all.middleCols(bj, ej - bj);
            MatrixXi dot = block_i.transpose() * block_j;
            for (int i = 0; i < dot.rows(); ++i)
                for (int j = 0; j < dot.cols(); ++j) {
                    double threshold = 0.05 * (norms[bi + i] + norms[bj + j]);
                    int64_t dp = dot(i, j);
                    if (dp / d > threshold) ++kept;
                }
        }
    }
    auto t1 = std::chrono::high_resolution_clock::now();
    double secs = std::chrono::duration<double>(t1 - t0).count();
    double pairs = double(N) * N;
    printf("{\"pairs\": %.0f, \"secs\": %.3f, \"pairs_per_sec\": %.1f, \"kept\": %lld}\n",
           pairs, secs, pairs / secs, (long long)kept);
    return 0;
}
