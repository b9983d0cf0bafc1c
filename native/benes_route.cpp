// Benes-network routing (control-bit computation) — native twin of
// abft_sparse_cg_tpu/utils/benes.py::benes_route.
//
// The TPU's Benes-route SpMV tier (ops/spmv_unstructured.py) needs one
// routed permutation per row block at matrix-build time.  The numpy
// looping algorithm is vectorized via pointer doubling but still costs
// ~2.4 s per 2^19-element block (argsort + log^2 doubling rounds); an
// 8-block bench-scale build paid ~80 s of routing.  The classic
// SEQUENTIAL looping algorithm is O(M log M) pointer chasing — ideal
// for a host core, pointless to vectorize — so it lives here.
//
// Stage order and ctrl semantics are identical to the Python
// reference (outer-first distances M/2..1..M/2; ctrl[s*M + i] == 1
// means positions i and i^d swap at stage s); equivalence is fenced
// by tests/test_benes.py::test_native_matches_python.

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// dst: element i must reach position dst[i]; M a power of two >= 2.
// ctrl: caller-allocated (2*log2(M)-1) * M uint8, row-major.
// Returns 0 on success, nonzero on malformed input.
int benes_route(const int64_t* dst, int64_t M, uint8_t* ctrl) {
    if (M < 2 || (M & (M - 1)))
        return 1;
    int m = 0;
    while ((int64_t(1) << m) < M)
        ++m;
    const int nstages = 2 * m - 1;

    std::vector<int64_t> rd(dst, dst + M);
    std::vector<int64_t> in_mate(M), out_mate(M);
    std::vector<int64_t> first(M / 2);
    std::vector<uint8_t> color(M);

    for (int level = 0; level < m - 1; ++level) {
        const int64_t n = M >> level;
        const int64_t h = n >> 1;
        const int64_t nsw = M / 2;   // h switches per block * (M/n)

        // in_mate: the other element on i's input switch
        // (switch id = (i/n)*h + (i & (h-1))).
        std::memset(first.data(), 0xff, nsw * sizeof(int64_t));
        for (int64_t i = 0; i < M; ++i) {
            int64_t s = (i / n) * h + (i & (h - 1));
            if (first[s] < 0) first[s] = i;
            else { in_mate[first[s]] = i; in_mate[i] = first[s]; }
        }
        // out_mate via the element's destination switch.
        std::memset(first.data(), 0xff, nsw * sizeof(int64_t));
        for (int64_t i = 0; i < M; ++i) {
            int64_t s = (i / n) * h + (rd[i] & (h - 1));
            if (first[s] < 0) first[s] = i;
            else { out_mate[first[s]] = i; out_mate[i] = first[s]; }
        }
        // 2-color the constraint cycles: alternate through out-mates,
        // preserve through succ = in_mate(out_mate(.)).
        std::memset(color.data(), 0xff, M);
        for (int64_t e0 = 0; e0 < M; ++e0) {
            if (color[e0] != 0xff) continue;
            int64_t e = e0;
            for (;;) {
                color[e] = 0;
                int64_t f = out_mate[e];
                color[f] = 1;
                int64_t e2 = in_mate[f];
                if (e2 == e0) break;
                e = e2;
            }
        }
        // First stage: swap iff color differs from the half bit.
        uint8_t* c1 = ctrl + int64_t(level) * M;
        for (int64_t i = 0; i < M; ++i)
            c1[i] = color[i] ^ ((i & h) ? 1 : 0);
        // Mirror stage: the color-0 element of output switch q arrives
        // at top input q; swap iff its dest is the bottom half.
        uint8_t* c2 = ctrl + int64_t(2 * m - 2 - level) * M;
        for (int64_t i = 0; i < M; ++i) {
            if (color[i]) continue;
            int64_t q = (i / n) * n + (rd[i] & (h - 1));
            uint8_t bit = (rd[i] & h) ? 1 : 0;
            c2[q] = bit;
            c2[q + h] = bit;
        }
        // Apply the first stage and reduce rd to the subnet.
        for (int64_t i = 0; i < M; ++i) {
            if (!(i & h) && c1[i]) {
                int64_t j = i | h;
                int64_t t = rd[i]; rd[i] = rd[j]; rd[j] = t;
            }
        }
        for (int64_t i = 0; i < M; ++i)
            rd[i] &= h - 1;
    }
    // Middle stage (distance 1).
    uint8_t* cm = ctrl + int64_t(m - 1) * M;
    for (int64_t i = 0; i < M; ++i)
        cm[i] = ((rd[i] ^ i) & 1) ? 1 : 0;
    (void)nstages;
    return 0;
}

}  // extern "C"
