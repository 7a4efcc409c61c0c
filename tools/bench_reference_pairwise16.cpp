// CPU baseline microbenchmark for the reference's int16 pairwise hot loop
// shape: per-pair AVX2 _mm256_madd_epi16 dot products over column-major
// int16 blocks with the float-division threshold scan (the reference's
// compute_sparse_dot_products_optimized_16, pairwise_comp_optimized_16bits
// .cpp:96-244; its binary cannot be built because the `bits` submodule is
// unpinned, so this standalone harness measures the same compute on
// synthetic data — the int16 counterpart of bench_reference_pairwise.cpp).
//
// Build: g++ -O2 -std=c++17 -mavx2 -fopenmp tools/bench_reference_pairwise16.cpp -o bench_ref16
// Run:   ./bench_ref16 [N] [d] [chunk]  -> prints JSON {"pairs_per_sec": ...}

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>
#if defined(__AVX2__)
#include <immintrin.h>
#elif defined(__SSE2__)
#include <emmintrin.h>
#include <pmmintrin.h>
#include <tmmintrin.h>
#endif

// one column-major block: col(c) = &data[c * d]
struct Block16 {
    std::vector<int16_t> data;
    int d, cols;
    const int16_t* col(int c) const { return &data[size_t(c) * d]; }
};

static int32_t dot16(const int16_t* a, const int16_t* b, int d) {
    int32_t dot = 0;
    int k = 0;
#if defined(__AVX2__)
    __m256i acc1 = _mm256_setzero_si256();
    __m256i acc2 = _mm256_setzero_si256();
    for (; k <= d - 32; k += 32) {  // 2x16 lanes per iteration
        __m256i vi1 = _mm256_loadu_si256((const __m256i*)&a[k]);
        __m256i vj1 = _mm256_loadu_si256((const __m256i*)&b[k]);
        acc1 = _mm256_add_epi32(acc1, _mm256_madd_epi16(vi1, vj1));
        __m256i vi2 = _mm256_loadu_si256((const __m256i*)&a[k + 16]);
        __m256i vj2 = _mm256_loadu_si256((const __m256i*)&b[k + 16]);
        acc2 = _mm256_add_epi32(acc2, _mm256_madd_epi16(vi2, vj2));
    }
    for (; k <= d - 16; k += 16) {
        __m256i vi = _mm256_loadu_si256((const __m256i*)&a[k]);
        __m256i vj = _mm256_loadu_si256((const __m256i*)&b[k]);
        acc1 = _mm256_add_epi32(acc1, _mm256_madd_epi16(vi, vj));
    }
    __m256i fin = _mm256_add_epi32(acc1, acc2);
    __m128i s = _mm_add_epi32(_mm256_extracti128_si256(fin, 0),
                              _mm256_extracti128_si256(fin, 1));
    s = _mm_hadd_epi32(s, s);
    s = _mm_hadd_epi32(s, s);
    dot += _mm_extract_epi32(s, 0);
#elif defined(__SSE2__)
    __m128i acc = _mm_setzero_si128();
    for (; k <= d - 8; k += 8) {
        __m128i vi = _mm_loadu_si128((const __m128i*)&a[k]);
        __m128i vj = _mm_loadu_si128((const __m128i*)&b[k]);
        acc = _mm_add_epi32(acc, _mm_madd_epi16(vi, vj));
    }
    acc = _mm_hadd_epi32(acc, acc);
    acc = _mm_hadd_epi32(acc, acc);
    dot += _mm_extract_epi32(acc, 0);
#endif
    for (; k < d; ++k) dot += int32_t(a[k]) * b[k];
    return dot;
}

int main(int argc, char** argv) {
    int N = argc > 1 ? atoi(argv[1]) : 2048;
    int d = argc > 2 ? atoi(argv[2]) : 2048;
    int chunk = argc > 3 ? atoi(argv[3]) : 512;

    // int16 sketch range: the reference stores int16 components when the
    // projection fits (SURVEY §2.4); keep |x| well inside to avoid the
    // madd pairwise-sum saturating concern being the variable under test
    std::mt19937 rng(0);
    std::uniform_int_distribution<int> dist(-900, 900);
    Block16 all{std::vector<int16_t>(size_t(N) * d), d, N};
    for (size_t t = 0; t < all.data.size(); ++t) all.data[t] = int16_t(dist(rng));
    std::vector<double> norms(N);
    for (int i = 0; i < N; ++i) {
        double s = 0;
        const int16_t* c = all.col(i);
        for (int j = 0; j < d; ++j) s += double(c[j]) * c[j];
        norms[i] = s / d;
    }

    long long kept = 0;
    auto t0 = std::chrono::high_resolution_clock::now();
    for (int bi = 0; bi < N; bi += chunk) {
        int ei = std::min(bi + chunk, N);
        for (int bj = 0; bj < N; bj += chunk) {
            int ej = std::min(bj + chunk, N);
            long long local_kept = 0;
#pragma omp parallel for schedule(dynamic, 8) reduction(+ : local_kept)
            for (int i = bi; i < ei; ++i) {
                const int16_t* ci = all.col(i);
                for (int j = bj; j < ej; ++j) {
                    int32_t dp = dot16(ci, all.col(j), d);
                    // the int16 engine divides in FLOAT (vs the int32
                    // engine's truncating integer division) — the
                    // documented retention divergence (PARITY.md)
                    double threshold = 0.05 * (norms[i] + norms[j]);
                    if (double(dp) / d > threshold) ++local_kept;
                }
            }
            kept += local_kept;
        }
    }
    auto t1 = std::chrono::high_resolution_clock::now();
    double secs = std::chrono::duration<double>(t1 - t0).count();
    double pairs = double(N) * N;
#if defined(__AVX2__)
    const char* isa = "avx2";
#elif defined(__SSE2__)
    const char* isa = "sse2";
#else
    const char* isa = "scalar";
#endif
    printf("{\"pairs\": %.0f, \"secs\": %.3f, \"pairs_per_sec\": %.1f, "
           "\"kept\": %lld, \"isa\": \"%s\"}\n",
           pairs, secs, pairs / secs, kept, isa);
    return 0;
}
