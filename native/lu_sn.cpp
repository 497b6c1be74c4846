// Supernodal multifrontal sparse LU for structurally (near-)symmetric
// matrices — the BLAS-3 factorization path.
//
// The scalar Gilbert-Peierls kernel in host_ext.cpp runs every elimination
// as a column-at-a-time scatter loop; on grid-shaped matrices (symmetric
// pattern, bounded fill under AMD/ND) 80%+ of the flops live in a few
// large separator cliques where a dense BLAS-3 formulation is an order of
// magnitude faster.  This file implements the classic multifrontal method
// (Duff-Reid; the organization UMFPACK/MUMPS use) specialized to symmetric
// patterns:
//
//   symbolic: one left-to-right pass over the symmetrized pattern builds
//     relaxed supernodes and their border (row-structure) sets directly —
//     a column j extends the open supernode iff j is the minimum of the
//     running border (equivalently: etree parent of j-1 is j) and the new
//     entries it brings stay under the relaxation budget.  Child fronts
//     attach at the column equal to the minimum of their border.
//
//   numeric: for each supernode, assemble a dense (w+b)^2 frontal matrix
//     from A's entries plus the children's Schur updates (extend-add),
//     factor the fully-summed w x w block with LAPACK getrf (partial
//     pivoting restricted to the front's fully-summed rows — legal because
//     those rows/columns have received every update), compute the panel
//     factors with trsm, and the Schur complement with gemm.
//
// Pivoting is *within-front* only, so this path targets the
// diagonally-dominant / symmetric-pattern systems of the power-flow domain
// (Ybus, B', connectivity normal equations); `splu(mode='auto')` falls
// back to the scalar threshold-pivoting kernel when the pattern is not
// symmetric or the factorization reports excessive growth.
//
// Reference parity note: the reference library has no LU at all (SURVEY §0
// scope note; the breadcrumb is src/research/scipy_wrappers.py's SuperLU
// internals) — this implements the capability the reference's domain
// needs, at BLAS-3 speed.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <numeric>
#include <vector>

#include "host_common.h"

#include <chrono>

using std::int64_t;

namespace {

struct SnProf {
  double prep = 0, symbolic = 0, assemble = 0, extadd = 0, blas = 0,
         harvest = 0, exp = 0;
  bool on = false;
  void dump() const {
    if (!on) return;
    std::fprintf(stderr,
                 "[snprof] prep=%.3f symbolic=%.3f assemble=%.3f "
                 "extadd=%.3f blas=%.3f harvest=%.3f export=%.3f\n",
                 prep, symbolic, assemble, extadd, blas, harvest, exp);
  }
};

inline double sn_now() {
  return std::chrono::duration<double>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

template <typename T>
void call_getrf_sn(int m, int n, T* a, int lda, int* ipiv, int* info);
template <>
void call_getrf_sn<double>(int m, int n, double* a, int lda, int* ipiv,
                           int* info) {
  g_blas.dgetrf(&m, &n, a, &lda, ipiv, info);
}
template <>
void call_getrf_sn<cplx>(int m, int n, cplx* a, int lda, int* ipiv,
                         int* info) {
  g_blas.zgetrf(&m, &n, a, &lda, ipiv, info);
}

template <typename T>
void call_trsm(char side, char uplo, char diag, int m, int n, const T* a,
               int lda, T* b, int ldb);
template <>
void call_trsm<double>(char side, char uplo, char diag, int m, int n,
                       const double* a, int lda, double* b, int ldb) {
  const char tr = 'N';
  const double one = 1.0;
  g_blas.dtrsm(&side, &uplo, &tr, &diag, &m, &n, &one, a, &lda, b, &ldb);
}
template <>
void call_trsm<cplx>(char side, char uplo, char diag, int m, int n,
                     const cplx* a, int lda, cplx* b, int ldb) {
  const char tr = 'N';
  const cplx one(1.0, 0.0);
  g_blas.ztrsm(&side, &uplo, &tr, &diag, &m, &n, &one, a, &lda, b, &ldb);
}

// C -= A @ B  (all column-major)
template <typename T>
void call_gemm_sub(int m, int n, int k, const T* a, int lda, const T* b,
                   int ldb, T* c, int ldc);
template <>
void call_gemm_sub<double>(int m, int n, int k, const double* a, int lda,
                           const double* b, int ldb, double* c, int ldc) {
  const char tr = 'N';
  const double mone = -1.0, one = 1.0;
  g_blas.dgemm(&tr, &tr, &m, &n, &k, &mone, a, &lda, b, &ldb, &one, c, &ldc);
}
template <>
void call_gemm_sub<cplx>(int m, int n, int k, const cplx* a, int lda,
                         const cplx* b, int ldb, cplx* c, int ldc) {
  const char tr = 'N';
  const cplx mone(-1.0, 0.0), one(1.0, 0.0);
  g_blas.zgemm(&tr, &tr, &m, &n, &k, &mone, a, &lda, b, &ldb, &one, c, &ldc);
}

struct Snode {
  int64_t c0, c1;                // column range [c0, c1)
  int64_t border_off, border_len;  // into the shared border pool
  int64_t child_head = -1;       // linked list of child snode ids
};

// -------------------------------------------------------------------------
// Symbolic phase.  Sp/Si: CSC pattern of B = A(q,q) symmetrized, rows
// sorted.  Produces supernodes with border sets (sorted, all > c1-1).
// -------------------------------------------------------------------------
struct Symbolic {
  std::vector<Snode> snodes;
  std::vector<int64_t> border_pool;
  std::vector<int64_t> child_next;  // sibling links, indexed by snode id
  int64_t max_front = 0;
};

bool build_symbolic(int64_t n, const int64_t* Sp, const int64_t* Si,
                    Symbolic& out) {
  std::vector<int64_t> in_cur(n, -1);   // stamp: element in current border
  std::vector<int64_t> cur;             // current border elements (unsorted)
  std::vector<int64_t> attach_head(n, -1);  // closed snodes by min(border)
  std::vector<int64_t>& child_next = out.child_next;
  std::vector<int64_t> pending_children;

  int64_t c0 = -1;  // open snode start (-1: none)
  int64_t nzeros = 0;  // explicit zeros admitted into the open snode
  int64_t live = 0;    // live element count of the running border

  auto close_snode = [&](int64_t c1) {
    Snode s;
    s.c0 = c0;
    s.c1 = c1;
    // children collected while the snode was open
    for (int64_t c : pending_children) {
      child_next[c] = s.child_head;
      s.child_head = c;
    }
    pending_children.clear();
    s.border_off = (int64_t)out.border_pool.size();
    std::sort(cur.begin(), cur.end());
    int64_t blen = 0;
    for (int64_t e : cur) {
      if (in_cur[e] >= 0) {  // not removed
        out.border_pool.push_back(e);
        ++blen;
        in_cur[e] = -1;
      }
    }
    s.border_len = blen;
    cur.clear();
    live = 0;
    const int64_t f = (s.c1 - s.c0) + blen;
    if (f > out.max_front) out.max_front = f;
    const int64_t id = (int64_t)out.snodes.size();
    out.snodes.push_back(s);
    if (blen > 0) {
      const int64_t pc = out.border_pool[s.border_off];  // min(border)
      // queue for attachment when column pc is processed
      child_next[id] = attach_head[pc];
      attach_head[pc] = id;
    }
    c0 = -1;
    nzeros = 0;
  };

  child_next.assign((size_t)n + 1, -1);  // at most n snodes

  for (int64_t j = 0; j < n; ++j) {
    // children whose update fronts attach at column j
    std::vector<int64_t> kids;
    for (int64_t c = attach_head[j]; c >= 0;) {
      kids.push_back(c);
      const int64_t nx = child_next[c];
      child_next[c] = -1;
      c = nx;
    }
    attach_head[j] = -1;

    const bool can_extend = c0 >= 0 && in_cur[j] >= 0;
    if (can_extend) {
      // count elements the extension would add
      int64_t extras = 0;
      for (int64_t p = Sp[j]; p < Sp[j + 1]; ++p) {
        const int64_t r = Si[p];
        if (r > j && in_cur[r] < 0) ++extras;
      }
      for (int64_t c : kids) {
        const Snode& cs = out.snodes[c];
        for (int64_t t = 0; t < cs.border_len; ++t) {
          const int64_t e = out.border_pool[cs.border_off + t];
          if (e > j && in_cur[e] < 0) ++extras;
        }
      }
      const int64_t w = j - c0;          // width before adding j
      const int64_t b_new = live - 1 + extras;  // live includes j itself
      const int64_t add_zeros = w * extras;
      // relaxation: fundamental (extras==0), tiny snodes, or bounded
      // explicit-zero fraction of the grown panel
      const int64_t panel = (w + 1) * (w + 1 + b_new);
      static const int relax_mode = [] {
        const char* e = std::getenv("CSPARSE3_SN_RELAX");
        return e ? (int)std::strtol(e, nullptr, 10) : 2;
      }();
      const bool accept =
          relax_mode == 0
              ? false
              : (extras == 0 || (relax_mode >= 2 &&
                                 ((w + 1 <= 16 && extras <= 8) ||
                                  (8 * (nzeros + add_zeros) <= panel))));
      if (accept) {
        in_cur[j] = -1;  // j leaves the border, becomes a column
        --live;
        nzeros += add_zeros;
        for (int64_t p = Sp[j]; p < Sp[j + 1]; ++p) {
          const int64_t r = Si[p];
          if (r > j && in_cur[r] < 0) {
            in_cur[r] = 1;
            ++live;
            cur.push_back(r);
          }
        }
        for (int64_t c : kids) {
          const Snode& cs = out.snodes[c];
          for (int64_t t = 0; t < cs.border_len; ++t) {
            const int64_t e = out.border_pool[cs.border_off + t];
            if (e > j && in_cur[e] < 0) {
              in_cur[e] = 1;
              ++live;
              cur.push_back(e);
            }
          }
          pending_children.push_back(c);
        }
        continue;
      }
    }

    // close the open snode (if any) and start a new one at j
    if (c0 >= 0) {
      // closing can queue the just-closed snode at THIS column (its
      // border minimum is j whenever j was in its running border), so
      // re-drain the attach queue afterwards
      close_snode(j);
      for (int64_t c = attach_head[j]; c >= 0;) {
        kids.push_back(c);
        const int64_t nx = child_next[c];
        child_next[c] = -1;
        c = nx;
      }
      attach_head[j] = -1;
    }
    c0 = j;
    for (int64_t p = Sp[j]; p < Sp[j + 1]; ++p) {
      const int64_t r = Si[p];
      if (r > j && in_cur[r] < 0) {
        in_cur[r] = 1;
        ++live;
        cur.push_back(r);
      }
    }
    for (int64_t c : kids) {
      const Snode& cs = out.snodes[c];
      for (int64_t t = 0; t < cs.border_len; ++t) {
        const int64_t e = out.border_pool[cs.border_off + t];
        if (e > j && in_cur[e] < 0) {
          in_cur[e] = 1;
          ++live;
          cur.push_back(e);
        }
      }
      pending_children.push_back(c);
    }
  }
  if (c0 >= 0) close_snode(n);
  return true;
}

// -------------------------------------------------------------------------
// Numeric phase
// -------------------------------------------------------------------------

template <typename T>
struct Update {
  T* buf = nullptr;       // b x b column-major Schur update
  size_t bytes = 0;
  bool mapped = false;
};

template <typename T>
LUResult* lu_factor_sn_impl(int64_t n, const int64_t* Ap, const int64_t* Ai,
                            const T* Ax, const int64_t* q) {
  if (!g_blas.ok3()) return nullptr;
  SnProf prof;
  prof.on = std::getenv("CSPARSE3_SN_PROF") != nullptr;
  double t0 = sn_now();

  // ---- B = A(q,q), pattern-symmetrized with explicit zeros -------------
  std::vector<int64_t> qinv(n);
  if (q)
    for (int64_t k = 0; k < n; ++k) qinv[q[k]] = k;

  const int64_t nnz = Ap[n];
  // C = A(q,q) as sorted CSC via two-pass counting on (col, row)
  std::vector<int64_t> Cp(n + 1, 0), Ci(nnz);
  std::vector<T> Cx(nnz);
  {
    std::vector<int64_t> cnt(n, 0);
    for (int64_t c = 0; c < n; ++c) {
      const int64_t cc = q ? qinv[c] : c;
      cnt[cc] += Ap[c + 1] - Ap[c];
    }
    for (int64_t c = 0; c < n; ++c) Cp[c + 1] = Cp[c] + cnt[c];
    // fill rows unsorted, then sort per column (rows within a column are
    // few; std::sort on (row,val) pairs per column is fine)
    std::vector<int64_t> w(Cp.begin(), Cp.end() - 1);
    for (int64_t c = 0; c < n; ++c) {
      const int64_t cc = q ? qinv[c] : c;
      for (int64_t p = Ap[c]; p < Ap[c + 1]; ++p) {
        const int64_t pos = w[cc]++;
        Ci[pos] = q ? qinv[Ai[p]] : Ai[p];
        Cx[pos] = Ax[p];
      }
    }
    std::vector<std::pair<int64_t, T>> scratch;
    for (int64_t c = 0; c < n; ++c) {
      scratch.clear();
      for (int64_t p = Cp[c]; p < Cp[c + 1]; ++p)
        scratch.emplace_back(Ci[p], Cx[p]);
      std::sort(scratch.begin(), scratch.end(),
                [](const auto& a, const auto& b) { return a.first < b.first; });
      int64_t p = Cp[c];
      for (const auto& pr : scratch) {
        Ci[p] = pr.first;
        Cx[p] = pr.second;
        ++p;
      }
    }
  }
  // CT pattern (transpose of C) for symmetrization
  std::vector<int64_t> Tp(n + 1, 0), Ti(nnz);
  std::vector<T> Tx(nnz);
  {
    std::vector<int64_t> cnt(n, 0);
    for (int64_t p = 0; p < nnz; ++p) cnt[Ci[p]]++;
    for (int64_t c = 0; c < n; ++c) Tp[c + 1] = Tp[c] + cnt[c];
    std::vector<int64_t> w(Tp.begin(), Tp.end() - 1);
    for (int64_t c = 0; c < n; ++c)
      for (int64_t p = Cp[c]; p < Cp[c + 1]; ++p) {
        const int64_t pos = w[Ci[p]]++;
        Ti[pos] = c;
        Tx[pos] = Cx[p];
      }
  }
  // S = C with pattern C|CT (explicit zeros where only CT has an entry);
  // R = S^T with values (rows of S by column) — built in the same merge.
  std::vector<int64_t> Sp(n + 1, 0), Si;
  std::vector<T> Sx;
  Si.reserve(nnz + nnz / 4);
  Sx.reserve(nnz + nnz / 4);
  for (int64_t c = 0; c < n; ++c) {
    int64_t pa = Cp[c], pb = Tp[c];
    const int64_t ea = Cp[c + 1], eb = Tp[c + 1];
    while (pa < ea || pb < eb) {
      const int64_t ra = pa < ea ? Ci[pa] : n;
      const int64_t rb = pb < eb ? Ti[pb] : n;
      if (ra < rb) {
        Si.push_back(ra);
        Sx.push_back(Cx[pa]);
        ++pa;
      } else if (rb < ra) {
        Si.push_back(rb);
        Sx.push_back(T(0));
        ++pb;
      } else {
        Si.push_back(ra);
        Sx.push_back(Cx[pa]);
        ++pa;
        ++pb;
      }
    }
    Sp[c + 1] = (int64_t)Si.size();
  }
  const int64_t snnz = (int64_t)Si.size();
  // R = transpose(S) with values (same symmetric pattern)
  std::vector<int64_t> Rp(n + 1, 0), Ri(snnz);
  std::vector<T> Rx(snnz);
  {
    std::vector<int64_t> cnt(n, 0);
    for (int64_t p = 0; p < snnz; ++p) cnt[Si[p]]++;
    for (int64_t c = 0; c < n; ++c) Rp[c + 1] = Rp[c] + cnt[c];
    std::vector<int64_t> w(Rp.begin(), Rp.end() - 1);
    for (int64_t c = 0; c < n; ++c)
      for (int64_t p = Sp[c]; p < Sp[c + 1]; ++p) {
        const int64_t pos = w[Si[p]]++;
        Ri[pos] = c;
        Rx[pos] = Sx[p];
      }
  }
  Cp.clear(); Ci.clear(); Cx.clear();
  Tp.clear(); Ti.clear(); Tx.clear();

  prof.prep = sn_now() - t0;
  t0 = sn_now();
  // ---- supernodes --------------------------------------------------------
  Symbolic sym;
  if (!build_symbolic(n, Sp.data(), Si.data(), sym)) return nullptr;
  if (std::getenv("CSPARSE3_SN_DEBUG")) {
    for (size_t s = 0; s < sym.snodes.size(); ++s) {
      const Snode& sn = sym.snodes[s];
      std::fprintf(stderr, "snode %zu cols [%lld,%lld) border(", s,
                   (long long)sn.c0, (long long)sn.c1);
      for (int64_t t = 0; t < sn.border_len; ++t)
        std::fprintf(stderr, "%lld ",
                     (long long)sym.border_pool[sn.border_off + t]);
      std::fprintf(stderr, ") kids(");
      for (int64_t c = sn.child_head; c >= 0; c = sym.child_next[c])
        std::fprintf(stderr, "%lld ", (long long)c);
      std::fprintf(stderr, ")\n");
    }
  }

  prof.symbolic = sn_now() - t0;
  // ---- numeric multifrontal sweep ---------------------------------------
  const int64_t ns = (int64_t)sym.snodes.size();
  std::vector<Update<T>> updates(ns);
  std::vector<int64_t> gmap(n, -1);
  std::vector<int64_t> perm_r(n), pinv(n);
  // factor entries, physical(B-space) rows, mapped to pivot space at export
  std::vector<int64_t> Lcp(n + 1, 0);
  std::vector<int64_t> Lrow;
  std::vector<T> Lval;
  std::vector<int64_t> Ucol_p(n + 2, 0);  // U triplets bucketed by column
  std::vector<std::pair<int64_t, T>> Utrip;  // (col<<? ) — store (row,val)
  std::vector<int64_t> Utrip_col;
  Lrow.reserve((size_t)snnz * 2);
  Lval.reserve((size_t)snnz * 2);
  Utrip.reserve((size_t)snnz * 2);
  Utrip_col.reserve((size_t)snnz * 2);

  bool fbuf_mapped = false;
  const size_t fbuf_bytes = (size_t)sym.max_front * sym.max_front * sizeof(T);
  T* F = (T*)pop_alloc_raw(std::max<size_t>(fbuf_bytes, 64), &fbuf_mapped);
  std::vector<int> ipiv((size_t)sym.max_front + 1);
  std::vector<int64_t> lp((size_t)sym.max_front + 1);
  bool failed = false;

  for (int64_t s = 0; s < ns && !failed; ++s) {
    const Snode& sn = sym.snodes[s];
    const int64_t w64 = sn.c1 - sn.c0, b64 = sn.border_len;
    const int64_t f64 = w64 + b64;
    const int w = (int)w64, b = (int)b64, f = (int)f64;
    const int64_t* border = sym.border_pool.data() + sn.border_off;
    t0 = sn_now();
    // local index map
    for (int64_t jj = 0; jj < w64; ++jj) gmap[sn.c0 + jj] = jj;
    for (int64_t t = 0; t < b64; ++t) gmap[border[t]] = w64 + t;
    std::fill(F, F + (size_t)f * f, T(0));
    // A entries: columns of the snode (F11 + F21), then rows (F12)
    for (int64_t jj = 0; jj < w64; ++jj) {
      const int64_t j = sn.c0 + jj;
      for (int64_t p = Sp[j]; p < Sp[j + 1]; ++p) {
        const int64_t r = Si[p];
        if (r < sn.c0) continue;  // upper entries: assembled as F12 rows
        const int64_t pos = gmap[r];
        if (pos < 0) { failed = true; break; }
        F[pos + (size_t)jj * f] += Sx[p];
      }
      // row j of B beyond the snode columns -> F12
      for (int64_t p = Rp[j]; p < Rp[j + 1]; ++p) {
        const int64_t c = Ri[p];
        if (c < sn.c1) continue;
        const int64_t pos = gmap[c];
        if (pos < 0) { failed = true; break; }
        F[jj + (size_t)pos * f] += Rx[p];
      }
      if (failed) break;
    }
    if (failed) break;
    prof.assemble += sn_now() - t0;
    t0 = sn_now();
    // extend-add children
    for (int64_t c = sn.child_head; c >= 0; c = sym.child_next[c]) {
      const Snode& cs = sym.snodes[c];
      Update<T>& u = updates[c];
      const int64_t cb = cs.border_len;
      const int64_t* cbord = sym.border_pool.data() + cs.border_off;
      for (int64_t j2 = 0; j2 < cb; ++j2) {
        const int64_t pj = gmap[cbord[j2]];
        if (pj < 0) { failed = true; break; }
        const T* src = u.buf + (size_t)j2 * cb;
        T* dst = F + (size_t)pj * f;
        for (int64_t i2 = 0; i2 < cb; ++i2) {
          const int64_t pi = gmap[cbord[i2]];
          dst[pi] += src[i2];
        }
      }
      pop_free_raw(u.buf, u.bytes, u.mapped);
      u.buf = nullptr;
      if (failed) break;
    }
    if (failed) break;
    prof.extadd += sn_now() - t0;
    t0 = sn_now();

    // factor fully-summed block
    int info = 0;
    call_getrf_sn<T>(w, w, F, f, ipiv.data(), &info);
    if (info != 0) { failed = true; break; }
    // local row permutation: factor row i <- local row lp[i]
    for (int i = 0; i < w; ++i) lp[i] = i;
    for (int i = 0; i < w; ++i) std::swap(lp[i], lp[ipiv[i] - 1]);
    for (int i = 0; i < w; ++i) {
      const int64_t phys = sn.c0 + lp[i];  // B-space row
      pinv[phys] = sn.c0 + i;
      perm_r[sn.c0 + i] = phys;
    }
    if (b > 0) {
      // apply the F11 row swaps to F12
      for (int i = 0; i < w; ++i) {
        const int piv = ipiv[i] - 1;
        if (piv != i)
          for (int jj = 0; jj < b; ++jj)
            std::swap(F[i + (size_t)(w + jj) * f],
                      F[piv + (size_t)(w + jj) * f]);
      }
      // U12 = L11^{-1} F12 ; L21 = F21 U11^{-1} ; S = F22 - L21 U12
      call_trsm<T>('L', 'L', 'U', w, b, F, f, F + (size_t)w * f, f);
      call_trsm<T>('R', 'U', 'N', b, w, F, f, F + w, f);
      call_gemm_sub<T>(b, b, w, F + w, f, F + (size_t)w * f, f,
                       F + w + (size_t)w * f, f);
      // save Schur update (malloc for small blocks: a populated mmap per
      // tiny front would be syscall-bound)
      Update<T>& u = updates[s];
      u.bytes = (size_t)b * b * sizeof(T);
      if (u.bytes >= (size_t)1 << 18) {
        u.buf = (T*)pop_alloc_raw(u.bytes, &u.mapped);
      } else {
        u.buf = (T*)std::malloc(u.bytes);
        u.mapped = false;
      }
      for (int jj = 0; jj < b; ++jj)
        std::memcpy(u.buf + (size_t)jj * b, F + w + (size_t)(w + jj) * f,
                    (size_t)b * sizeof(T));
    }

    prof.blas += sn_now() - t0;
    t0 = sn_now();
    // harvest factor entries
    for (int jj = 0; jj < w; ++jj) {
      const int64_t k = sn.c0 + jj;
      // L column k: sub-diagonal of L11 (physical row c0+lp[i]) + L21
      for (int i = jj + 1; i < w; ++i) {
        const T v = F[i + (size_t)jj * f];
        if (v != T(0)) {
          Lrow.push_back(sn.c0 + lp[i]);
          Lval.push_back(v);
        }
      }
      for (int t = 0; t < b; ++t) {
        const T v = F[w + t + (size_t)jj * f];
        if (v != T(0)) {
          Lrow.push_back(border[t]);
          Lval.push_back(v);
        }
      }
      Lcp[k + 1] = (int64_t)Lrow.size();
      // U column k: upper of F11 incl. diagonal (pivot-space rows c0+i)
      for (int i = 0; i <= jj; ++i) {
        const T v = F[i + (size_t)jj * f];
        if (v != T(0) || i == jj) {
          Utrip_col.push_back(k);
          Utrip.emplace_back(sn.c0 + i, v);
        }
      }
    }
    // U12 rows: entry (pivot row c0+i, column border[t])
    for (int t = 0; t < b; ++t) {
      const int64_t c = border[t];
      for (int i = 0; i < w; ++i) {
        const T v = F[i + (size_t)(w + t) * f];
        if (v != T(0)) {
          Utrip_col.push_back(c);
          Utrip.emplace_back(sn.c0 + i, v);
        }
      }
    }
    // clear gmap
    for (int64_t jj = 0; jj < w64; ++jj) gmap[sn.c0 + jj] = -1;
    for (int64_t t = 0; t < b64; ++t) gmap[border[t]] = -1;
    prof.harvest += sn_now() - t0;
  }

  pop_free_raw(F, std::max<size_t>(fbuf_bytes, 64), fbuf_mapped);
  if (failed) {
    for (auto& u : updates)
      if (u.buf) pop_free_raw(u.buf, u.bytes, u.mapped);
    return nullptr;
  }

  t0 = sn_now();
  // ---- export ------------------------------------------------------------
  auto* res = (LUResult*)std::malloc(sizeof(LUResult));
  res->n = n;
  res->nsing = 0;
  res->sing = (int64_t*)std::malloc(sizeof(int64_t));
  const int64_t lnz = n + (int64_t)Lrow.size();
  const int64_t unz = (int64_t)Utrip.size();
  res->lnz = lnz;
  res->unz = unz;
  res->Lp = (int64_t*)std::malloc((n + 1) * sizeof(int64_t));
  res->Li = (int64_t*)std::malloc(std::max<int64_t>(lnz, 1) * sizeof(int64_t));
  auto* Lx = (T*)std::malloc(std::max<int64_t>(lnz, 1) * sizeof(T));
  res->Lx = Lx;
  res->Up = (int64_t*)std::malloc((n + 1) * sizeof(int64_t));
  res->Ui = (int64_t*)std::malloc(std::max<int64_t>(unz, 1) * sizeof(int64_t));
  auto* Ux = (T*)std::malloc(std::max<int64_t>(unz, 1) * sizeof(T));
  res->Ux = Ux;

  // L: map physical rows to pivot space, sort per column
  std::vector<std::pair<int64_t, T>> scratch;
  int64_t out = 0;
  for (int64_t k = 0; k < n; ++k) {
    res->Lp[k] = out;
    res->Li[out] = k;
    Lx[out++] = T(1);
    scratch.clear();
    for (int64_t e = Lcp[k]; e < Lcp[k + 1]; ++e)
      scratch.emplace_back(pinv[Lrow[e]], Lval[e]);
    std::sort(scratch.begin(), scratch.end(),
              [](const auto& a, const auto& b) { return a.first < b.first; });
    for (const auto& pr : scratch) {
      res->Li[out] = pr.first;
      Lx[out++] = pr.second;
    }
  }
  res->Lp[n] = out;

  // U: bucket triplets by column, sort rows per column
  {
    std::vector<int64_t> cnt(n, 0);
    for (int64_t t = 0; t < unz; ++t) cnt[Utrip_col[t]]++;
    res->Up[0] = 0;
    for (int64_t c = 0; c < n; ++c) res->Up[c + 1] = res->Up[c] + cnt[c];
    std::vector<int64_t> wfill(res->Up, res->Up + n);
    for (int64_t t = 0; t < unz; ++t) {
      const int64_t pos = wfill[Utrip_col[t]]++;
      res->Ui[pos] = Utrip[t].first;
      Ux[pos] = Utrip[t].second;
    }
    for (int64_t c = 0; c < n; ++c) {
      scratch.clear();
      for (int64_t p = res->Up[c]; p < res->Up[c + 1]; ++p)
        scratch.emplace_back(res->Ui[p], Ux[p]);
      std::sort(scratch.begin(), scratch.end(),
                [](const auto& a, const auto& b) { return a.first < b.first; });
      int64_t p = res->Up[c];
      for (const auto& pr : scratch) {
        res->Ui[p] = pr.first;
        Ux[p] = pr.second;
        ++p;
      }
    }
  }

  // perm_r in ORIGINAL row space (perm_r[k] = original row of pivot k)
  res->perm_r = (int64_t*)std::malloc(n * sizeof(int64_t));
  for (int64_t k = 0; k < n; ++k)
    res->perm_r[k] = q ? q[perm_r[k]] : perm_r[k];
  prof.exp = sn_now() - t0;
  prof.dump();
  return res;
}

}  // namespace

extern "C" {

LUResult* lu_factor_sn_d(int64_t n, const int64_t* Ap, const int64_t* Ai,
                         const double* Ax, const int64_t* q) {
  return lu_factor_sn_impl<double>(n, Ap, Ai, Ax, q);
}

LUResult* lu_factor_sn_z(int64_t n, const int64_t* Ap, const int64_t* Ai,
                         const void* Ax, const int64_t* q) {
  return lu_factor_sn_impl<cplx>(n, Ap, Ai, (const cplx*)Ax, q);
}

}  // extern "C"
