// Bit-packed GF(2) linear algebra — native host library.
//
// The framework's host-side GF(2) workhorse: 64-bit-word row operations for
// rank / RREF / solve / OSD-0, used by code construction (logical-operator
// extraction over large space-time matrices) and as a fast exact oracle for
// the on-device decoders. The reference does all of this in pure-Python
// loops (decoding/OSD.py:31-72); this is the framework's native equivalent
// (~64 columns per instruction instead of one).
//
// C ABI only — consumed through ctypes (no pybind11 dependency).

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>
#include <numeric>

namespace {

inline int word_count(int n) { return (n + 63) / 64; }

inline uint64_t get_bit(const uint64_t* row, int j) {
  return (row[j >> 6] >> (j & 63)) & 1ull;
}

inline void flip_bit(uint64_t* row, int j) { row[j >> 6] ^= 1ull << (j & 63); }

// Pack a row-major uint8 {0,1} matrix into 64-bit words per row.
void pack(const uint8_t* M, int m, int n, std::vector<uint64_t>& out) {
  int nw = word_count(n);
  out.assign(static_cast<size_t>(m) * nw, 0);
  for (int i = 0; i < m; ++i) {
    uint64_t* row = &out[static_cast<size_t>(i) * nw];
    const uint8_t* src = M + static_cast<size_t>(i) * n;
    for (int j = 0; j < n; ++j)
      if (src[j] & 1) flip_bit(row, j);
  }
}

// In-place full RREF of packed [A | b]; returns rank, writes pivot column of
// each pivot row into pivot_cols (size >= m, -1 padded).
int rref(std::vector<uint64_t>& A, uint8_t* b, int m, int n,
         int32_t* pivot_cols) {
  int nw = word_count(n);
  for (int i = 0; i < m; ++i) pivot_cols[i] = -1;
  int rank = 0;
  for (int col = 0; col < n && rank < m; ++col) {
    int piv = -1;
    for (int r = rank; r < m; ++r) {
      if (get_bit(&A[static_cast<size_t>(r) * nw], col)) { piv = r; break; }
    }
    if (piv < 0) continue;
    if (piv != rank) {
      for (int w = 0; w < nw; ++w)
        std::swap(A[static_cast<size_t>(piv) * nw + w],
                  A[static_cast<size_t>(rank) * nw + w]);
      if (b) std::swap(b[piv], b[rank]);
    }
    uint64_t* prow = &A[static_cast<size_t>(rank) * nw];
    for (int r = 0; r < m; ++r) {
      if (r == rank) continue;
      uint64_t* row = &A[static_cast<size_t>(r) * nw];
      if (get_bit(row, col)) {
        for (int w = 0; w < nw; ++w) row[w] ^= prow[w];
        if (b) b[r] ^= b[rank];
      }
    }
    pivot_cols[rank] = col;
    ++rank;
  }
  return rank;
}

}  // namespace

extern "C" {

// rank of an m x n uint8 {0,1} matrix
int gf2_rank(const uint8_t* M, int m, int n) {
  std::vector<uint64_t> A;
  pack(M, m, n, A);
  std::vector<int32_t> piv(m);
  return rref(A, nullptr, m, n, piv.data());
}

// Full RREF; writes reduced matrix back to M (uint8), syndrome to b, pivot
// columns (length m, -1 padded). Returns rank.
int gf2_rref(uint8_t* M, uint8_t* b, int m, int n, int32_t* pivot_cols) {
  std::vector<uint64_t> A;
  pack(M, m, n, A);
  int rank = rref(A, b, m, n, pivot_cols);
  int nw = word_count(n);
  for (int i = 0; i < m; ++i) {
    const uint64_t* row = &A[static_cast<size_t>(i) * nw];
    uint8_t* dst = M + static_cast<size_t>(i) * n;
    for (int j = 0; j < n; ++j) dst[j] = static_cast<uint8_t>(get_bit(row, j));
  }
  return rank;
}

// Solve H x = s (one solution). Returns 1 on success, 0 if inconsistent.
int gf2_solve(const uint8_t* H, const uint8_t* s, int m, int n, uint8_t* x) {
  std::vector<uint64_t> A;
  pack(H, m, n, A);
  std::vector<uint8_t> b(s, s + m);
  std::vector<int32_t> piv(m);
  int rank = rref(A, b.data(), m, n, piv.data());
  for (int r = rank; r < m; ++r)
    if (b[r]) return 0;
  std::memset(x, 0, n);
  for (int r = 0; r < rank; ++r) x[piv[r]] = b[r];
  return 1;
}

// OSD-0 (reference semantics: decoding/OSD.py:3-28): sort columns by |llr|
// ascending (stable), RREF the permuted system on the residual syndrome,
// back-substitute pivots, un-permute, XOR into the hard decision.
// solution must hold n bytes. Returns the rank of H.
int gf2_osd0(const uint8_t* H, const uint8_t* syndrome, const double* llr,
             const uint8_t* hard, int m, int n, uint8_t* solution) {
  // residual syndrome = syndrome XOR H @ hard
  std::vector<uint8_t> resid(m);
  for (int i = 0; i < m; ++i) {
    uint8_t acc = syndrome[i] & 1;
    const uint8_t* row = H + static_cast<size_t>(i) * n;
    for (int j = 0; j < n; ++j) acc ^= (row[j] & hard[j] & 1);
    resid[i] = acc;
  }
  // stable reliability ordering
  std::vector<int> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(), [&](int a, int c) {
    double va = llr[a] < 0 ? -llr[a] : llr[a];
    double vc = llr[c] < 0 ? -llr[c] : llr[c];
    return va < vc;
  });
  // permuted H, packed
  std::vector<uint8_t> Hp(static_cast<size_t>(m) * n);
  for (int i = 0; i < m; ++i)
    for (int j = 0; j < n; ++j)
      Hp[static_cast<size_t>(i) * n + j] = H[static_cast<size_t>(i) * n + order[j]];
  std::vector<uint64_t> A;
  pack(Hp.data(), m, n, A);
  std::vector<int32_t> piv(m);
  int rank = rref(A, resid.data(), m, n, piv.data());
  // back-substitute + un-permute + XOR into hard
  std::vector<uint8_t> e_perm(n, 0);
  for (int r = 0; r < rank; ++r) e_perm[piv[r]] = resid[r];
  for (int j = 0; j < n; ++j) solution[order[j]] = e_perm[j];
  for (int j = 0; j < n; ++j) solution[j] = (solution[j] ^ hard[j]) & 1;
  return rank;
}

// Kernel (null space) basis of an m x n matrix. basis must hold
// (n - rank) * n bytes (call gf2_rank first to size it). Returns dim.
int gf2_nullspace(const uint8_t* M, int m, int n, uint8_t* basis) {
  std::vector<uint64_t> A;
  pack(M, m, n, A);
  std::vector<int32_t> piv(m);
  int rank = rref(A, nullptr, m, n, piv.data());
  std::vector<uint8_t> is_piv(n, 0);
  for (int r = 0; r < rank; ++r) is_piv[piv[r]] = 1;
  int nw = word_count(n);
  int k = 0;
  for (int f = 0; f < n; ++f) {
    if (is_piv[f]) continue;
    uint8_t* v = basis + static_cast<size_t>(k) * n;
    std::memset(v, 0, n);
    v[f] = 1;
    for (int r = 0; r < rank; ++r)
      if (get_bit(&A[static_cast<size_t>(r) * nw], f)) v[piv[r]] = 1;
    ++k;
  }
  return k;
}

}  // extern "C"
