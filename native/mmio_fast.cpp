// Fast Matrix Market coordinate-body parser (the C3 native tier).
//
// The reference links NIST mmio.c and parses element lines one fscanf
// call at a time (reference cg.cpp:371, mmio.c). The Python fallback
// (np.loadtxt) measures ~20 MB/s — minutes for a multi-GB .mtx — so
// this library parses the body with std::from_chars over OpenMP chunks
// (~GB/s). formats/mmio.py calls it via ctypes and falls back to
// np.loadtxt whenever this parser declines (syntax it doesn't like,
// entry-count mismatch), so behavior is a strict superset in speed and
// identical in accepted inputs / error reporting.
//
// Contract (see mm_parse_coordinate below): parse exactly `nnz`
// whitespace-separated entries of `ncols` fields (2 = pattern: "i j";
// 3 = real/integer: "i j value") from buf[0:len). Indices are written
// 1-based exactly as found (Python rebases). Blank lines are skipped
// anywhere in the body, matching loadtxt. Returns nnz on success, the
// actual line count when it differs (caller falls back to raise the
// canonical mismatch error), or -1 on a syntax error (caller falls
// back; loadtxt then accepts or raises canonically).

#include <cctype>
#include <charconv>
#include <cstdint>
#include <cstring>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

inline const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

inline const char* skip_line(const char* p, const char* end) {
  const char* nl =
      static_cast<const char*>(memchr(p, '\n', static_cast<size_t>(end - p)));
  return nl != nullptr ? nl + 1 : end;
}

// A body line counts iff it contains any non-whitespace character.
inline bool line_is_blank(const char* p, const char* end) {
  for (; p < end && *p != '\n'; ++p)
    if (*p != ' ' && *p != '\t' && *p != '\r') return false;
  return true;
}

// std::from_chars rejects a leading '+' (Fortran writers emit them).
inline const char* skip_plus(const char* p, const char* end) {
  return (p < end && *p == '+') ? p + 1 : p;
}

// Parse one entry starting at line start `p`. Returns the char after
// the consumed line, or nullptr on syntax error.
inline const char* parse_entry(const char* p, const char* end, int ncols,
                               int64_t* i, int64_t* j, double* v) {
  p = skip_plus(skip_ws(p, end), end);
  auto r1 = std::from_chars(p, end, *i);
  if (r1.ec != std::errc()) return nullptr;
  p = skip_plus(skip_ws(r1.ptr, end), end);
  auto r2 = std::from_chars(p, end, *j);
  if (r2.ec != std::errc()) return nullptr;
  p = r2.ptr;
  if (ncols == 3) {
    p = skip_plus(skip_ws(p, end), end);
    auto r3 = std::from_chars(p, end, *v,
                              std::chars_format::general);
    if (r3.ec != std::errc()) return nullptr;
    p = r3.ptr;
  }
  // Only trailing whitespace may follow on the line.
  p = skip_ws(p, end);
  if (p < end && *p != '\n') return nullptr;
  return p < end ? p + 1 : end;
}

}  // namespace

extern "C" {

// Parse `nnz` coordinate entries from buf[0:len). ncols selects the
// field layout (2 = pattern, 3 = real/integer). iout/jout receive the
// 1-based indices as written in the file; vout (ignored for ncols==2,
// may be null then) receives the values. Returns:
//   nnz           — success, all outputs filled
//   other >= 0    — entry-count mismatch (that many non-blank lines)
//   -1            — syntax error somewhere in the body
int64_t mm_parse_coordinate(const char* buf, int64_t len, int64_t nnz,
                            int ncols, int64_t* iout, int64_t* jout,
                            double* vout) {
  if (len < 0 || nnz < 0 || (ncols != 2 && ncols != 3) ||
      (ncols == 3 && vout == nullptr))
    return -1;
  const char* end = buf + len;

#ifdef _OPENMP
  int nthreads = omp_get_max_threads();
#else
  int nthreads = 1;
#endif
  if (nthreads < 1) nthreads = 1;
  if (len < (1 << 16)) nthreads = 1;  // not worth forking for small files

  if (nthreads == 1) {
    // Fused single pass: parse as we count (skips the count pre-scan).
    const char* p = buf;
    int64_t k = 0;
    while (p < end) {
      const char* q = skip_ws(p, end);
      if (q >= end) break;
      if (*q == '\n') {
        p = q + 1;
        continue;
      }
      if (k >= nnz) {  // surplus line: finish the count for the caller
        int64_t c = nnz + 1;
        p = skip_line(q, end);
        while (p < end) {
          if (!line_is_blank(p, end)) ++c;
          p = skip_line(p, end);
        }
        return c;
      }
      double v = 0.0;
      const char* nxt = parse_entry(q, end, ncols, &iout[k], &jout[k], &v);
      if (nxt == nullptr) return -1;
      if (ncols == 3) vout[k] = v;
      ++k;
      p = nxt;
    }
    return k;
  }

  // Chunk byte ranges, snapped forward to line starts so every line is
  // owned by exactly one chunk.
  constexpr int kMaxThreads = 256;
  if (nthreads > kMaxThreads) nthreads = kMaxThreads;
  const char* starts[kMaxThreads + 1];
  starts[0] = buf;
  for (int t = 1; t < nthreads; ++t) {
    // First line start at/after the nominal split: if the previous
    // byte isn't '\n' we're mid-line, so the line belongs to the
    // previous chunk — skip past it.
    const char* p = buf + (len * t) / nthreads;
    if (p > buf && p[-1] != '\n') p = skip_line(p, end);
    starts[t] = p;
  }
  starts[nthreads] = end;
  // Monotonicity guard (snapping can cross a neighbor on tiny chunks).
  for (int t = 1; t <= nthreads; ++t)
    if (starts[t] < starts[t - 1]) starts[t] = starts[t - 1];

  // Pass 1: count non-blank lines per chunk.
  int64_t counts[kMaxThreads] = {0};
#pragma omp parallel for num_threads(nthreads) schedule(static, 1)
  for (int t = 0; t < nthreads; ++t) {
    const char* p = starts[t];
    const char* e = starts[t + 1];
    int64_t c = 0;
    while (p < e) {
      if (!line_is_blank(p, e)) ++c;
      p = skip_line(p, e);
    }
    counts[t] = c;
  }
  int64_t offsets[kMaxThreads + 1];
  offsets[0] = 0;
  for (int t = 0; t < nthreads; ++t) offsets[t + 1] = offsets[t] + counts[t];
  if (offsets[nthreads] != nnz) return offsets[nthreads];

  // Pass 2: parse into the prefix-summed slots.
  int err = 0;
#pragma omp parallel for num_threads(nthreads) schedule(static, 1)
  for (int t = 0; t < nthreads; ++t) {
    const char* p = starts[t];
    const char* e = starts[t + 1];
    int64_t k = offsets[t];
    while (p < e) {
      if (line_is_blank(p, e)) {
        p = skip_line(p, e);
        continue;
      }
      double v = 0.0;
      const char* nxt = parse_entry(p, e, ncols, &iout[k], &jout[k], &v);
      if (nxt == nullptr) {
#pragma omp atomic write
        err = 1;
        break;
      }
      if (ncols == 3) vout[k] = v;
      ++k;
      p = nxt;
    }
  }
  if (err) return -1;
  return nnz;
}

}  // extern "C"
