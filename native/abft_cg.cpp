// abft_cg — native host backend for abft_sparse_cg_tpu (the "cpu" target).
//
// A C++/OpenMP implementation of the ABFT-protected CG solve over the
// framework's plane-of-uint32 matrix representation (SoA: one array per
// 32-bit codeword word), NOT the reference's array-of-structs layout.
// Exposed through a small C ABI consumed via ctypes.
//
// Differences from the reference kernels (by design):
//   - SoA planes shared zero-copy with NumPy; values live as the two
//     halves of their binary64 pattern, reassembled on use.
//   - Parity masks are generated at init time from the Hamming-code
//     construction (see ../abft_sparse_cg_tpu/ecc/layout.py), not
//     hard-coded tables.
//   - Errors return a code + first-offender index instead of exit(1);
//     the Python driver renders the reference's exact stdout strings.
//   - secded uses the parity-first structure with an unconditional (but
//     branch-predicted) syndrome, preserving true double-bit detection.
//   - Corrections are written back to the caller's planes (the
//     reference's in-place scrub semantics; capability parity with
//     reference CSR/CPUContext.cpp:275-277).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <chrono>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr int kParityBits = 7;
constexpr uint32_t kColMask = 0x00FFFFFFu;

struct Layout {
  int num_words;   // 3 (csr96) or 4 (coo128)
  int col_word;    // which word holds column + ECC byte
  uint32_t masks[kParityBits][4];
};

bool is_pow2(uint32_t x) { return x && !(x & (x - 1)); }

// Generate the per-word parity masks for one layout (same construction
// as ecc/layout.py::_gen_hamming_masks).
void gen_masks(Layout& L) {
  std::memset(L.masks, 0, sizeof(L.masks));
  const int region_lo = L.col_word * 32 + 24;
  const int region_hi = L.col_word * 32 + 32;
  uint32_t x = 3;
  for (int g = 0; g < L.num_words * 32; g++) {
    const int word = g / 32, bit = g % 32;
    if (g >= region_lo && g < region_hi) {
      const int p = L.col_word * 32 + 32 - g;
      if (p >= 1 && p <= kParityBits) L.masks[p - 1][word] |= 1u << bit;
      continue;
    }
    while (is_pow2(x)) x++;
    for (int p = 1; p <= kParityBits; p++)
      if (x & (1u << (p - 1))) L.masks[p - 1][word] |= 1u << bit;
    x++;
  }
}

Layout make_layout(bool coo) {
  Layout L;
  L.num_words = coo ? 4 : 3;
  L.col_word = coo ? 0 : 2;
  gen_masks(L);
  return L;
}

const Layout kCsr = make_layout(false);
const Layout kCoo = make_layout(true);

inline uint32_t parity32(uint32_t v) { return __builtin_parity(v); }

inline uint32_t overall_parity(const Layout& L, const uint32_t* w) {
  uint32_t acc = w[0];
  for (int i = 1; i < L.num_words; i++) acc ^= w[i];
  return parity32(acc);
}

inline uint32_t syndrome(const Layout& L, const uint32_t* w) {
  uint32_t result = 0;
  for (int p = 1; p <= kParityBits; p++) {
    uint32_t acc = 0;
    for (int i = 0; i < L.num_words; i++) acc ^= w[i] & L.masks[p - 1][i];
    result |= parity32(acc) << (32 - p);
  }
  return result;
}

inline uint32_t decode_bit(const Layout& L, uint32_t syn) {
  uint32_t x = 0;
  for (int p = 1; p <= kParityBits; p++)
    x |= ((syn >> (32 - p)) & 1u) << (p - 1);
  const uint32_t blen = 32 - __builtin_clz(x);
  if (is_pow2(x)) return L.col_word * 32 + 31 - (blen - 1);
  uint32_t data_bit = x - blen - 1;
  if (data_bit >= (uint32_t)(L.col_word * 32 + 24)) data_bit += 8;
  return data_bit;
}

inline double val_of(uint32_t lo, uint32_t hi) {
  uint64_t bits = (uint64_t)lo | ((uint64_t)hi << 32);
  double d;
  std::memcpy(&d, &bits, 8);
  return d;
}

// Error codes — keep in sync with ops/spmv.py.
enum {
  ERR_NONE = 0,
  ERR_SED = 1,
  ERR_DOUBLE = 2,
  ERR_COL_SIZE = 3,
  ERR_COL_ORDER = 4,
  ERR_ROW_SIZE = 5,
  ERR_ROW_ORDER = 6,
};

struct Stats {
  int errcode = ERR_NONE;
  int64_t err_index = -1;
  int64_t corrected_count = 0;
  int64_t first_cor_index = -1;
  int first_cor_bit = -1;

  void raise_err(int code, int64_t idx) {
    if (errcode == ERR_NONE) { errcode = code; err_index = idx; }
  }
  void correct(int64_t idx, int bit) {
    corrected_count++;
    if (first_cor_index < 0) { first_cor_index = idx; first_cor_bit = bit; }
  }
};

// Modes — keep in sync with ecc/codec.py.
enum Mode { M_NONE, M_CONSTRAINTS, M_SED, M_SEC7, M_SEC8, M_SECDED };

int mode_of(const char* m) {
  if (!std::strcmp(m, "none")) return M_NONE;
  if (!std::strcmp(m, "constraints")) return M_CONSTRAINTS;
  if (!std::strcmp(m, "sed")) return M_SED;
  if (!std::strcmp(m, "sec7")) return M_SEC7;
  if (!std::strcmp(m, "sec8")) return M_SEC8;
  if (!std::strcmp(m, "secded")) return M_SECDED;
  return -1;
}

// Per-element ECC check/correct.  Returns the (possibly corrected)
// element words in `w`; writes corrections back into the planes so later
// passes see a scrubbed matrix (reference semantics).  Returns false on
// a fail-stop condition (recorded in st).
template <int NW>
inline bool check_element(const Layout& L, int mode, uint32_t* w,
                          uint32_t* const* planes, int64_t i, Stats& st) {
  switch (mode) {
    case M_NONE:
    case M_CONSTRAINTS:
      return true;
    case M_SED:
      if (overall_parity(L, w)) { st.raise_err(ERR_SED, i); return false; }
      return true;
    case M_SEC7: {
      const uint32_t syn = syndrome(L, w);
      if (__builtin_expect(syn != 0, 0)) {
        const uint32_t bit = decode_bit(L, syn);
        w[bit / 32] ^= 1u << (bit % 32);
        for (int k = 0; k < NW; k++) planes[k][i] = w[k];
        st.correct(i, (int)bit);
      }
      return true;
    }
    case M_SEC8: {
      if (__builtin_expect(overall_parity(L, w) != 0, 0)) {
        const uint32_t syn = syndrome(L, w);
        const uint32_t bit = syn ? decode_bit(L, syn)
                                 : (uint32_t)(L.col_word * 32 + 24);
        w[bit / 32] ^= 1u << (bit % 32);
        for (int k = 0; k < NW; k++) planes[k][i] = w[k];
        st.correct(i, (int)bit);
      }
      return true;
    }
    case M_SECDED: {
      const uint32_t par = overall_parity(L, w);
      if (__builtin_expect(par != 0, 0)) {
        const uint32_t syn = syndrome(L, w);
        const uint32_t bit = syn ? decode_bit(L, syn)
                                 : (uint32_t)(L.col_word * 32 + 24);
        w[bit / 32] ^= 1u << (bit % 32);
        for (int k = 0; k < NW; k++) planes[k][i] = w[k];
        st.correct(i, (int)bit);
      } else {
        // True DED requires the syndrome on the clean-parity path too.
        const uint32_t syn = syndrome(L, w);
        if (__builtin_expect(syn != 0, 0)) {
          st.raise_err(ERR_DOUBLE, i);
          return false;
        }
      }
      return true;
    }
  }
  return true;
}

}  // namespace

extern "C" {

struct CgResult {
  int errcode;
  int64_t err_index;
  int64_t corrected_count;
  int64_t first_cor_index;
  int first_cor_bit;
  int iterations;
  double rr;
  double solve_ms;
};

// CSR SpMV with fused ABFT.  planes: vlo, vhi, colecc. OpenMP over rows.
static int spmv_csr(int mode, uint32_t* vlo, uint32_t* vhi, uint32_t* col,
                    const int64_t* row_ptr, int64_t N, int64_t nnz,
                    const double* x, double* y, Stats& st) {
  uint32_t* planes[3] = {vlo, vhi, col};
  volatile int failed = 0;
#pragma omp parallel
  {
    Stats local;
#pragma omp for schedule(static) nowait
    for (int64_t r = 0; r < N; r++) {
      if (failed) continue;
      double acc = 0.0;
      const int64_t end = row_ptr[r + 1];
      for (int64_t i = row_ptr[r]; i < end; i++) {
        uint32_t w[3] = {vlo[i], vhi[i], col[i]};
        if (mode == M_CONSTRAINTS) {
          if ((int64_t)w[2] >= N) { local.raise_err(ERR_COL_SIZE, i); failed = 1; break; }
          if (i + 1 < end && col[i + 1] <= w[2]) {
            local.raise_err(ERR_COL_ORDER, i); failed = 1; break;
          }
        }
        if (!check_element<3>(kCsr, mode, w, planes, i, local)) {
          failed = 1;
          break;
        }
        const uint32_t c = (mode >= M_SED) ? (w[2] & kColMask) : w[2];
        acc += val_of(w[0], w[1]) * x[c < (uint32_t)N ? c : 0];
      }
      y[r] = acc;
    }
#pragma omp critical
    {
      if (local.errcode && !st.errcode) {
        st.errcode = local.errcode;
        st.err_index = local.err_index;
      } else if (local.errcode && local.err_index < st.err_index) {
        st.err_index = local.err_index;  // deterministic: first index wins
      }
      st.corrected_count += local.corrected_count;
      if (local.first_cor_index >= 0 &&
          (st.first_cor_index < 0 || local.first_cor_index < st.first_cor_index)) {
        st.first_cor_index = local.first_cor_index;
        st.first_cor_bit = local.first_cor_bit;
      }
    }
  }
  return st.errcode;
}

// COO SpMV with fused ABFT.  planes: colecc, row, vlo, vhi.  Serial
// scatter (result[col] += v * x[row]), like the reference's COO kernel.
static int spmv_coo(int mode, uint32_t* col, uint32_t* row, uint32_t* vlo,
                    uint32_t* vhi, int64_t N, int64_t nnz, const double* x,
                    double* y, Stats& st) {
  uint32_t* planes[4] = {col, row, vlo, vhi};
  std::memset(y, 0, N * sizeof(double));
  for (int64_t i = 0; i < nnz; i++) {
    uint32_t w[4] = {col[i], row[i], vlo[i], vhi[i]};
    if (mode == M_CONSTRAINTS) {
      if ((int64_t)w[1] >= N) { st.raise_err(ERR_ROW_SIZE, i); return st.errcode; }
      if ((int64_t)w[0] >= N) { st.raise_err(ERR_COL_SIZE, i); return st.errcode; }
      if (i + 1 < nnz) {
        if (row[i + 1] < w[1]) { st.raise_err(ERR_ROW_ORDER, i); return st.errcode; }
        if (row[i + 1] == w[1] && col[i + 1] <= w[0]) {
          st.raise_err(ERR_COL_ORDER, i); return st.errcode;
        }
      }
    }
    if (!check_element<4>(kCoo, mode, w, planes, i, st)) return st.errcode;
    const uint32_t c = (mode >= M_SED) ? (w[0] & kColMask) : w[0];
    const uint32_t r = w[1];
    if (c < (uint32_t)N && r < (uint32_t)N)
      y[c] += val_of(w[2], w[3]) * x[r];
  }
  return st.errcode;
}

int abft_spmv(const char* fmt, const char* mode_s,
              uint32_t* w0, uint32_t* w1, uint32_t* w2, uint32_t* w3,
              const int64_t* row_ptr, int64_t N, int64_t nnz,
              const double* x, double* y, CgResult* out) {
  const int mode = mode_of(mode_s);
  if (mode < 0) return -1;
  Stats st;
  if (!std::strcmp(fmt, "csr"))
    spmv_csr(mode, w0, w1, w2, row_ptr, N, nnz, x, y, st);
  else
    spmv_coo(mode, w0, w1, w2, w3, N, nnz, x, y, st);
  out->errcode = st.errcode;
  out->err_index = st.err_index;
  out->corrected_count = st.corrected_count;
  out->first_cor_index = st.first_cor_index;
  out->first_cor_bit = st.first_cor_bit;
  return st.errcode;
}

// Full CG solve (reference algorithm, cg.cpp:83-118) over the planes.
// `minv` (nullable) enables Jacobi-preconditioned CG — convergence is
// still tested on rr = r.r like the reference.
int abft_cg_solve(const char* fmt, const char* mode_s,
                  uint32_t* w0, uint32_t* w1, uint32_t* w2, uint32_t* w3,
                  const int64_t* row_ptr, int64_t N, int64_t nnz,
                  const double* b, const double* minv, double* x,
                  double* rr_trace, int max_itrs, double conv,
                  CgResult* out) {
  const int mode = mode_of(mode_s);
  if (mode < 0) return -1;
  const bool csr = !std::strcmp(fmt, "csr");

  double* r = new double[N];
  double* p = new double[N];
  double* w = new double[N];

  const auto t0 = std::chrono::steady_clock::now();

  double rr = 0.0, rz = 0.0;
#pragma omp parallel for reduction(+ : rr, rz) schedule(static)
  for (int64_t i = 0; i < N; i++) {
    x[i] = 0.0;
    r[i] = b[i];
    p[i] = minv ? minv[i] * b[i] : b[i];
    rr += b[i] * b[i];
    rz += b[i] * p[i];
  }

  Stats st;
  int itr = 0;
  for (; itr < max_itrs && rr > conv; itr++) {
    int err = csr ? spmv_csr(mode, w0, w1, w2, row_ptr, N, nnz, p, w, st)
                  : spmv_coo(mode, w0, w1, w2, w3, N, nnz, p, w, st);
    if (err) break;

    double pw = 0.0;
#pragma omp parallel for reduction(+ : pw) schedule(static)
    for (int64_t i = 0; i < N; i++) pw += p[i] * w[i];

    const double alpha = rz / pw;

    double rr_new = 0.0, rz_new = 0.0;
    if (minv) {
#pragma omp parallel for reduction(+ : rr_new, rz_new) schedule(static)
      for (int64_t i = 0; i < N; i++) {
        x[i] += alpha * p[i];
        r[i] -= alpha * w[i];
        rr_new += r[i] * r[i];
        rz_new += r[i] * (minv[i] * r[i]);
      }
    } else {
#pragma omp parallel for reduction(+ : rr_new) schedule(static)
      for (int64_t i = 0; i < N; i++) {
        x[i] += alpha * p[i];
        r[i] -= alpha * w[i];
        rr_new += r[i] * r[i];
      }
      rz_new = rr_new;
    }

    const double beta = rz_new / rz;
    if (minv) {
#pragma omp parallel for schedule(static)
      for (int64_t i = 0; i < N; i++) p[i] = minv[i] * r[i] + beta * p[i];
    } else {
#pragma omp parallel for schedule(static)
      for (int64_t i = 0; i < N; i++) p[i] = r[i] + beta * p[i];
    }

    rr = rr_new;
    rz = rz_new;
    if (rr_trace) rr_trace[itr] = rr;
  }

  const auto t1 = std::chrono::steady_clock::now();

  out->errcode = st.errcode;
  out->err_index = st.err_index;
  out->corrected_count = st.corrected_count;
  out->first_cor_index = st.first_cor_index;
  out->first_cor_bit = st.first_cor_bit;
  out->iterations = itr;
  out->rr = rr;
  out->solve_ms =
      std::chrono::duration<double, std::milli>(t1 - t0).count();

  delete[] r;
  delete[] p;
  delete[] w;
  return st.errcode;
}

int abft_num_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
