// csparse3-tpu native host kernels.
//
// The reference ships its native compute as templated C++ sparsetools
// (reference: src/sparsetools/*.h) bound via SWIG; here the native layer
// covers only the *host-symbolic* pieces that are inherently sequential
// and latency-bound in Python — sparse LU factorization (the left-looking
// algorithm of linalg/lu_host.py, reference breadcrumb
// src/research/scipy_wrappers.py), triplet->CSC assembly, and entry-stream
// sort/dedup — while all throughput compute stays on the TPU via XLA.
// Bound with ctypes (plain extern "C"), no SWIG/pybind.
//
// Build: make -C native   (produces csparse3_tpu/native/libhost_ext.so)

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdio>
#include <complex>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <numeric>
#include <vector>

using std::int64_t;
using cplx = std::complex<double>;

extern "C" {

struct LUResult {
  int64_t n;
  int64_t lnz;
  int64_t unz;
  int64_t nsing;
  int64_t* Lp;
  int64_t* Li;
  int64_t* Up;
  int64_t* Ui;
  int64_t* perm_r;
  int64_t* sing;
  void* Lx;
  void* Ux;
};

void lu_free(LUResult* r) {
  if (!r) return;
  std::free(r->Lp);
  std::free(r->Li);
  std::free(r->Up);
  std::free(r->Ui);
  std::free(r->perm_r);
  std::free(r->sing);
  std::free(r->Lx);
  std::free(r->Ux);
  std::free(r);
}

}  // extern "C"

namespace {

template <typename T>
double mag(T x) {
  return std::abs(x);
}

template <typename T>
T inf_fill(T x) {
  return x * std::numeric_limits<double>::infinity();
}
template <>
cplx inf_fill(cplx x) {
  return x * std::numeric_limits<double>::infinity();
}

// Left-looking sparse LU with threshold partial pivoting (Gilbert-Peierls
// with Eisenstat-Liu symmetric pruning, as in KLU/SuperLU).  Twin of
// linalg/lu_host.py::lu_factor_host (same reach/eliminate/pivot/split
// semantics, including SuperLU-style singular handling: zero pivot ->
// inf/nan fill, column recorded in `sing`).
//
// L is built in one contiguous growable buffer (original-row space); each
// finished column j carries a pruned length plen[j]: once a symmetric
// pivot pair (U(j,k) != 0 and pivrow_k in L(:,j)) is found, the column is
// partitioned so that DFS traversals only scan the already-pivotal front —
// the non-pivotal tail is reachable through column k instead.  This drops
// the symbolic cost from O(lnz) scans per column to near the true edge
// count, which is the main gap between naive GP and KLU-class solvers.
#ifdef LU_PROFILE
struct LuProf {
  double dfs = 0, numeric = 0, split = 0, prune = 0, exp = 0;
  int64_t dfs_edges = 0, num_flops = 0, prune_scans = 0, prune_hits = 0;
  ~LuProf() {
    std::fprintf(stderr,
                 "[luprof] dfs=%.3fs numeric=%.3fs split=%.3fs prune=%.3fs "
                 "export=%.3fs | edges=%lld flops=%lld scans=%lld hits=%lld\n",
                 dfs, numeric, split, prune, exp, (long long)dfs_edges,
                 (long long)num_flops, (long long)prune_scans,
                 (long long)prune_hits);
  }
};
static LuProf g_luprof;
#define LU_TIC auto _t0 = std::chrono::steady_clock::now()
#define LU_TOC(field)                                                     \
  do {                                                                    \
    auto _t1 = std::chrono::steady_clock::now();                          \
    g_luprof.field += std::chrono::duration<double>(_t1 - _t0).count();   \
    _t0 = _t1;                                                            \
  } while (0)
#else
#define LU_TIC
#define LU_TOC(field)
#endif

template <typename T>
LUResult* lu_factor(int64_t n, const int64_t* Ap, const int64_t* Ai,
                    const T* Ax, const int64_t* q, double tol) {
  // L under construction: contiguous (column-appended) buffers.
  std::vector<int64_t> Lcp(n + 1, 0);
  std::vector<int64_t> Lrow;
  std::vector<T> Lval;
  Lrow.reserve((size_t)(4 * Ap[n] + n));
  Lval.reserve((size_t)(4 * Ap[n] + n));
  std::vector<int64_t> plen(n, -1);  // pruned front length; -1 = unpruned

  // U: emitted in column order directly.
  std::vector<int64_t> Up(n + 1, 0);
  std::vector<int64_t> Urow;
  std::vector<T> Uval;
  Urow.reserve((size_t)(2 * Ap[n] + n));
  Uval.reserve((size_t)(2 * Ap[n] + n));

  std::vector<int64_t> pinv(n, -1), perm_r(n, -1);
  std::vector<int64_t> singular;

  std::vector<T> x(n, T(0));
  std::vector<int64_t> flag(n, -1), in_pattern(n, -1);
  std::vector<int64_t> stack(n), estack(n), topo(n);
  std::vector<int64_t> pat_rows;
  pat_rows.reserve(n);

  for (int64_t k = 0; k < n; ++k) {
    const int64_t col = q ? q[k] : k;
    const int64_t a_lo = Ap[col], a_hi = Ap[col + 1];
    LU_TIC;

    // ---- symbolic: reach via DFS over pivot-node graph -------------------
    // Pruned columns are traversed only over their pivotal front.
    int64_t top = n;
    pat_rows.clear();
    for (int64_t p = a_lo; p < a_hi; ++p) {
      const int64_t r = Ai[p];
      if (in_pattern[r] != k) {
        in_pattern[r] = k;
        pat_rows.push_back(r);
      }
      const int64_t j0 = pinv[r];
      if (j0 >= 0 && flag[j0] != k) {
        int64_t sp = 0;
        stack[0] = j0;
        estack[0] = 0;
        flag[j0] = k;
        while (sp >= 0) {
          const int64_t node = stack[sp];
          const int64_t lo = Lcp[node];
          const int64_t hi =
              plen[node] >= 0 ? lo + plen[node] : Lcp[node + 1];
          int64_t e = lo + estack[sp];
          bool advanced = false;
          while (e < hi) {
            const int64_t rr = Lrow[e];
            ++e;
#ifdef LU_PROFILE
            g_luprof.dfs_edges += 1;
#endif
            if (in_pattern[rr] != k) {
              in_pattern[rr] = k;
              pat_rows.push_back(rr);
            }
            const int64_t jj = pinv[rr];
            if (jj >= 0 && flag[jj] != k) {
              flag[jj] = k;
              estack[sp] = e - lo;
              ++sp;
              stack[sp] = jj;
              estack[sp] = 0;
              advanced = true;
              break;
            }
          }
          if (!advanced) {
            --top;
            topo[top] = node;
            --sp;
          }
        }
      }
    }

    LU_TOC(dfs);
    // ---- numeric: x = L^{-1} a (full column spans, pruned or not) --------
    for (int64_t p = a_lo; p < a_hi; ++p) x[Ai[p]] = T(0);
    for (int64_t p = a_lo; p < a_hi; ++p) x[Ai[p]] += Ax[p];
    for (int64_t t = top; t < n; ++t) {
      const int64_t j = topo[t];
      const T xj = x[perm_r[j]];
      if (xj != T(0)) {
        const int64_t* rj = Lrow.data() + Lcp[j];
        const T* vj = Lval.data() + Lcp[j];
        const int64_t len = Lcp[j + 1] - Lcp[j];
#ifdef LU_PROFILE
        g_luprof.num_flops += len;
#endif
        for (int64_t e = 0; e < len; ++e) x[rj[e]] -= vj[e] * xj;
      }
    }

    LU_TOC(numeric);
    // ---- pivot -----------------------------------------------------------
    int64_t best_r = -1;
    double best_a = 0.0;
    const int64_t diag_r = col;
    for (const int64_t r : pat_rows) {
      if (pinv[r] < 0) {
        const double a_ = mag(x[r]);
        if (a_ > best_a) {
          best_a = a_;
          best_r = r;
        }
      }
    }
    T pivot_val;
    if (best_r < 0 || best_a == 0.0) {
      singular.push_back(k);
      if (best_r < 0) {
        for (int64_t r = 0; r < n; ++r)
          if (pinv[r] < 0) {
            best_r = r;
            break;
          }
      }
      pivot_val = T(0);
    } else {
      if (pinv[diag_r] < 0 && in_pattern[diag_r] == k &&
          mag(x[diag_r]) >= tol * best_a)
        best_r = diag_r;  // threshold diagonal preference
      pivot_val = x[best_r];
    }
    pinv[best_r] = k;
    perm_r[k] = best_r;

    // ---- split x into U column and L column ------------------------------
    for (const int64_t r : pat_rows) {
      const int64_t pr = pinv[r];
      if (r == best_r) continue;
      if (pr >= 0 && pr < k) {
        Urow.push_back(pr);
        Uval.push_back(x[r]);
      } else if (pr < 0) {
        const T xv = x[r];
        if (xv != T(0)) {
          Lval.push_back(pivot_val != T(0) ? xv / pivot_val : inf_fill(xv));
          Lrow.push_back(r);
        }
      }
      x[r] = T(0);
    }
    x[best_r] = T(0);
    Urow.push_back(k);
    Uval.push_back(pivot_val);
    Lcp[k + 1] = (int64_t)Lrow.size();
    Up[k + 1] = (int64_t)Urow.size();

    LU_TOC(split);
    // ---- symmetric pruning ----------------------------------------------
    // For each j with U(j,k) != 0: if pivrow_k appears in L(:,j), partition
    // the column so pivotal rows come first; future DFS stops there.
    for (int64_t p = Up[k]; p < Up[k + 1] - 1; ++p) {  // skip the pivot entry
      const int64_t j = Urow[p];
      if (plen[j] >= 0) continue;  // already pruned
      const int64_t lo = Lcp[j], hi = Lcp[j + 1];
#ifdef LU_PROFILE
      g_luprof.prune_scans += hi - lo;
#endif
      bool found = false;
      for (int64_t e = lo; e < hi; ++e)
        if (Lrow[e] == best_r) {
          found = true;
          break;
        }
      if (!found) continue;
      int64_t i = lo, jj = hi - 1;
      while (i <= jj) {
        if (pinv[Lrow[i]] >= 0) {
          ++i;
        } else {
          std::swap(Lrow[i], Lrow[jj]);
          std::swap(Lval[i], Lval[jj]);
          --jj;
        }
      }
      plen[j] = i - lo;
#ifdef LU_PROFILE
      g_luprof.prune_hits += 1;
#endif
    }
    LU_TOC(prune);
  }

  LU_TIC;
  // ---- export: canonical CSC (per-column row sort), L with unit diag ----
  auto* res = (LUResult*)std::malloc(sizeof(LUResult));
  res->n = n;
  res->nsing = (int64_t)singular.size();

  const int64_t lnz = n + (int64_t)Lrow.size();
  const int64_t unz = (int64_t)Urow.size();
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

  std::vector<std::pair<int64_t, T>> scratch;
  int64_t out = 0;
  for (int64_t k = 0; k < n; ++k) {
    res->Lp[k] = out;
    res->Li[out] = k;  // unit diagonal, smallest pivot-space row
    Lx[out++] = T(1);
    const int64_t lo = Lcp[k], hi = Lcp[k + 1];
    scratch.clear();
    for (int64_t e = lo; e < hi; ++e)
      scratch.emplace_back(pinv[Lrow[e]], Lval[e]);
    std::sort(scratch.begin(), scratch.end(),
              [](const auto& a, const auto& b) { return a.first < b.first; });
    for (const auto& pr : scratch) {
      res->Li[out] = pr.first;
      Lx[out++] = pr.second;
    }
  }
  res->Lp[n] = out;

  out = 0;
  for (int64_t k = 0; k < n; ++k) {
    res->Up[k] = out;
    const int64_t lo = Up[k], hi = Up[k + 1];
    scratch.clear();
    for (int64_t e = lo; e < hi; ++e) scratch.emplace_back(Urow[e], Uval[e]);
    std::sort(scratch.begin(), scratch.end(),
              [](const auto& a, const auto& b) { return a.first < b.first; });
    for (const auto& pr : scratch) {
      res->Ui[out] = pr.first;
      Ux[out++] = pr.second;
    }
  }
  res->Up[n] = out;

  res->perm_r = (int64_t*)std::malloc(n * sizeof(int64_t));
  std::memcpy(res->perm_r, perm_r.data(), n * sizeof(int64_t));
  res->sing =
      (int64_t*)std::malloc(std::max<int64_t>(res->nsing, 1) * sizeof(int64_t));
  if (res->nsing)
    std::memcpy(res->sing, singular.data(), res->nsing * sizeof(int64_t));
  LU_TOC(exp);
  return res;
}

}  // namespace

extern "C" {

LUResult* lu_factor_d(int64_t n, const int64_t* Ap, const int64_t* Ai,
                      const double* Ax, const int64_t* q, double tol) {
  return lu_factor<double>(n, Ap, Ai, Ax, q, tol);
}

LUResult* lu_factor_z(int64_t n, const int64_t* Ap, const int64_t* Ai,
                      const void* Ax, const int64_t* q, double tol) {
  return lu_factor<cplx>(n, Ap, Ai, (const cplx*)Ax, q, tol);
}

// Triplet -> canonical CSC assembly (sum duplicates).  Returns the unique
// count; caller passes output buffers of capacity nnz (worst case).
// Host twin of ops/construct.from_triplets.
int64_t coo_to_csc_d(int64_t m, int64_t n, int64_t nnz, const int64_t* rows,
                     const int64_t* cols, const double* vals, int64_t* out_p,
                     int64_t* out_i, double* out_x) {
  (void)m;
  std::vector<int64_t> order(nnz);
  std::iota(order.begin(), order.end(), 0);
  std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    if (cols[a] != cols[b]) return cols[a] < cols[b];
    return rows[a] < rows[b];
  });
  std::memset(out_p, 0, (n + 1) * sizeof(int64_t));
  int64_t u = -1;
  int64_t prev_r = -1, prev_c = -1;
  for (int64_t k = 0; k < nnz; ++k) {
    const int64_t o = order[k];
    if (rows[o] != prev_r || cols[o] != prev_c) {
      ++u;
      out_i[u] = rows[o];
      out_x[u] = vals[o];
      out_p[cols[o] + 1]++;
      prev_r = rows[o];
      prev_c = cols[o];
    } else {
      out_x[u] += vals[o];
    }
  }
  for (int64_t c = 0; c < n; ++c) out_p[c + 1] += out_p[c];
  return u + 1;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Approximate minimum degree ordering (quotient graph with element
// absorption and AMD-style approximate external degrees).  Replaces the
// Python greedy mindeg (linalg/ordering.py) for large n.  Operates on the
// symmetrized pattern of a square CSC; returns the elimination order.
// ---------------------------------------------------------------------------

namespace {

struct DegreeLists {
  // bucket lists indexed by degree, intrusive doubly linked
  std::vector<int64_t> head, nxt, prv, deg;
  int64_t mindeg = 0;
  explicit DegreeLists(int64_t n) : head(n + 1, -1), nxt(n, -1), prv(n, -1), deg(n, 0) {}
  void insert(int64_t v, int64_t d) {
    deg[v] = d;
    prv[v] = -1;
    nxt[v] = head[d];
    if (head[d] >= 0) prv[head[d]] = v;
    head[d] = v;
    if (d < mindeg) mindeg = d;
  }
  void remove(int64_t v) {
    if (prv[v] >= 0)
      nxt[prv[v]] = nxt[v];
    else
      head[deg[v]] = nxt[v];
    if (nxt[v] >= 0) prv[nxt[v]] = prv[v];
  }
  int64_t pop_min(int64_t n) {
    while (mindeg <= n && head[mindeg] < 0) ++mindeg;
    const int64_t v = head[mindeg];
    if (v >= 0) remove(v);
    return v;
  }
};

}  // namespace

extern "C" {

// Ap/Ai: CSC pattern of a square n x n matrix (values ignored).
// perm_out: length n, filled with the elimination order.
void amd_order(int64_t n, const int64_t* Ap, const int64_t* Ai,
               int64_t* perm_out) {
  // ---- symmetrize pattern (A + A^T, no self loops) -----------------------
  const int64_t nnz = Ap[n];
  std::vector<int64_t> cnt(n, 0);
  for (int64_t c = 0; c < n; ++c)
    for (int64_t p = Ap[c]; p < Ap[c + 1]; ++p) {
      const int64_t r = Ai[p];
      if (r != c) {
        cnt[r]++;
        cnt[c]++;
      }
    }
  std::vector<int64_t> ptr(n + 1, 0);
  for (int64_t i = 0; i < n; ++i) ptr[i + 1] = ptr[i] + cnt[i];
  std::vector<int64_t> adj(ptr[n]);
  std::vector<int64_t> fill = ptr;
  for (int64_t c = 0; c < n; ++c)
    for (int64_t p = Ap[c]; p < Ap[c + 1]; ++p) {
      const int64_t r = Ai[p];
      if (r != c) {
        adj[fill[r]++] = c;
        adj[fill[c]++] = r;
      }
    }
  (void)nnz;

  // dedup each adjacency list
  std::vector<std::vector<int64_t>> var_adj(n), elem_adj(n), elem_vars(n);
  {
    std::vector<int64_t> stamp(n, -1);
    for (int64_t i = 0; i < n; ++i) {
      auto& v = var_adj[i];
      v.reserve(ptr[i + 1] - ptr[i]);
      for (int64_t p = ptr[i]; p < ptr[i + 1]; ++p) {
        const int64_t u = adj[p];
        if (stamp[u] != i) {
          stamp[u] = i;
          v.push_back(u);
        }
      }
    }
  }
  adj.clear();
  adj.shrink_to_fit();

  std::vector<char> alive(n, 1), elem_alive(n, 0);
  std::vector<int64_t> mark(n, -1), estamp(n, -1), w(n, 0);
  DegreeLists dl(n);
  for (int64_t i = 0; i < n; ++i) dl.insert(i, (int64_t)var_adj[i].size());

  std::vector<int64_t> Lp;
  Lp.reserve(n);

  for (int64_t k = 0; k < n; ++k) {
    const int64_t p = dl.pop_min(n);
    perm_out[k] = p;
    alive[p] = 0;

    // ---- build Lp = pattern of the new element ---------------------------
    Lp.clear();
    mark[p] = k;
    for (const int64_t v : var_adj[p])
      if (alive[v] && mark[v] != k) {
        mark[v] = k;
        Lp.push_back(v);
      }
    for (const int64_t e : elem_adj[p])
      if (elem_alive[e]) {
        for (const int64_t v : elem_vars[e])
          if (alive[v] && mark[v] != k) {
            mark[v] = k;
            Lp.push_back(v);
          }
        elem_alive[e] = 0;  // merged into p
        elem_vars[e].clear();
        elem_vars[e].shrink_to_fit();
      }
    var_adj[p].clear();
    var_adj[p].shrink_to_fit();
    elem_adj[p].clear();
    elem_adj[p].shrink_to_fit();
    elem_vars[p] = Lp;  // p becomes an element
    elem_alive[p] = 1;

    // ---- w[e] = |Le \ Lp| for elements touching Lp -----------------------
    for (const int64_t v : Lp)
      for (const int64_t e : elem_adj[v])
        if (elem_alive[e]) {
          if (estamp[e] != k) {
            estamp[e] = k;
            // |Le| counting only alive vars
            int64_t c = 0;
            for (const int64_t u : elem_vars[e]) c += alive[u];
            w[e] = c;
          }
          --w[e];
        }

    // ---- update each variable in Lp --------------------------------------
    const int64_t lp_sz = (int64_t)Lp.size();
    for (const int64_t v : Lp) {
      // prune var list: drop dead vars and members of Lp (now covered by p)
      auto& va = var_adj[v];
      size_t out = 0;
      for (const int64_t u : va)
        if (alive[u] && mark[u] != k) va[out++] = u;
      va.resize(out);

      // prune elements: absorb those with Le subset of Lp, approximate degree
      auto& ea = elem_adj[v];
      int64_t d = (int64_t)va.size() + (lp_sz - 1);
      size_t eo = 0;
      for (const int64_t e : ea)
        if (elem_alive[e]) {
          if (estamp[e] == k && w[e] <= 0) {
            elem_alive[e] = 0;  // absorbed into p
            elem_vars[e].clear();
            elem_vars[e].shrink_to_fit();
          } else {
            d += (estamp[e] == k) ? w[e] : (int64_t)elem_vars[e].size();
            ea[eo++] = e;
          }
        }
      ea.resize(eo);
      ea.push_back(p);
      if (d > n - k - 1) d = n - k - 1;
      if (d < 0) d = 0;
      dl.remove(v);
      dl.insert(v, d);
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Refactorization-plan builder (host symbolic for linalg/refactor.py).
// Computes, from a fixed L/U pattern: per-column wavefront levels, the
// elementary update triples (dst, srcL, srcU) counting-sorted by source
// level, the division pairs, and the A->X scatter map.
// ---------------------------------------------------------------------------

extern "C" {

struct RefactorBuild {
  int64_t total;   // update triples
  int64_t ndiv;    // division pairs (= L off-diag count)
  int64_t nlev;
  int64_t* upd_dst;
  int64_t* upd_L;
  int64_t* upd_U;
  int64_t* upd_lev;  // sorted ascending
  int64_t* div_dst;
  int64_t* div_piv;
  int64_t* div_lev;  // sorted ascending
  int64_t* a_dst;    // per A entry
};

void refactor_free(RefactorBuild* r) {
  if (!r) return;
  std::free(r->upd_dst);
  std::free(r->upd_L);
  std::free(r->upd_U);
  std::free(r->upd_lev);
  std::free(r->div_dst);
  std::free(r->div_piv);
  std::free(r->div_lev);
  std::free(r->a_dst);
  std::free(r);
}

RefactorBuild* refactor_build(int64_t n, const int64_t* Lp, const int64_t* Li,
                              const int64_t* Up, const int64_t* Ui,
                              int64_t a_nnz, const int64_t* Ap,
                              const int64_t* Ai, const int64_t* perm_r,
                              const int64_t* q) {
  const int64_t lnz = Lp[n];

  auto posL = [&](int64_t r, int64_t k) -> int64_t {
    const int64_t* lo = Li + Lp[k];
    const int64_t* hi = Li + Lp[k + 1];
    return (std::lower_bound(lo, hi, r) - Li);
  };
  auto posU = [&](int64_t r, int64_t k) -> int64_t {
    const int64_t* lo = Ui + Up[k];
    const int64_t* hi = Ui + Up[k + 1];
    return lnz + (std::lower_bound(lo, hi, r) - Ui);
  };

  // U off-diag grouped by ROW (source column of updates)
  std::vector<int64_t> urow_cnt(n + 1, 0);
  for (int64_t k = 0; k < n; ++k)
    for (int64_t p = Up[k]; p < Up[k + 1]; ++p)
      if (Ui[p] != k) urow_cnt[Ui[p] + 1]++;
  std::vector<int64_t> urow_ptr(n + 1, 0);
  for (int64_t i = 0; i < n; ++i) urow_ptr[i + 1] = urow_ptr[i] + urow_cnt[i + 1];
  std::vector<int64_t> urow_col(urow_ptr[n]), urow_pos(urow_ptr[n]);
  {
    std::vector<int64_t> fill = urow_ptr;
    for (int64_t k = 0; k < n; ++k)
      for (int64_t p = Up[k]; p < Up[k + 1]; ++p)
        if (Ui[p] != k) {
          const int64_t j = Ui[p];
          urow_col[fill[j]] = k;
          urow_pos[fill[j]] = lnz + p;
          fill[j]++;
        }
  }

  // levels: single ascending pass (all edges go low -> high)
  std::vector<int64_t> lev(n, 0);
  for (int64_t j = 0; j < n; ++j) {
    for (int64_t p = Up[j]; p < Up[j + 1]; ++p)  // U(i, j), i < j
      if (Ui[p] != j && lev[Ui[p]] + 1 > lev[j]) lev[j] = lev[Ui[p]] + 1;
    for (int64_t p = Lp[j]; p < Lp[j + 1]; ++p)  // L(r, j), r > j
      if (Li[p] != j && lev[j] + 1 > lev[Li[p]]) lev[Li[p]] = lev[j] + 1;
  }
  int64_t nlev = 1;
  for (int64_t j = 0; j < n; ++j) nlev = std::max(nlev, lev[j] + 1);

  // total update triples
  int64_t total = 0;
  for (int64_t j = 0; j < n; ++j) {
    const int64_t cu = urow_ptr[j + 1] - urow_ptr[j];
    const int64_t cl = Lp[j + 1] - Lp[j] - 1;  // off-diag count
    total += cu * cl;
  }

  auto* res = (RefactorBuild*)std::malloc(sizeof(RefactorBuild));
  res->total = total;
  res->nlev = nlev;
  res->upd_dst = (int64_t*)std::malloc(std::max<int64_t>(total, 1) * 8);
  res->upd_L = (int64_t*)std::malloc(std::max<int64_t>(total, 1) * 8);
  res->upd_U = (int64_t*)std::malloc(std::max<int64_t>(total, 1) * 8);
  res->upd_lev = (int64_t*)std::malloc(std::max<int64_t>(total, 1) * 8);

  // counting sort by level: offsets
  std::vector<int64_t> lev_cnt(nlev + 1, 0);
  for (int64_t j = 0; j < n; ++j) {
    const int64_t cu = urow_ptr[j + 1] - urow_ptr[j];
    const int64_t cl = Lp[j + 1] - Lp[j] - 1;
    lev_cnt[lev[j] + 1] += cu * cl;
  }
  for (int64_t l = 0; l < nlev; ++l) lev_cnt[l + 1] += lev_cnt[l];
  std::vector<int64_t> lev_fill(lev_cnt.begin(), lev_cnt.end() - 1);

  for (int64_t j = 0; j < n; ++j) {
    const int64_t l = lev[j];
    for (int64_t up = urow_ptr[j]; up < urow_ptr[j + 1]; ++up) {
      const int64_t k = urow_col[up];
      const int64_t srcU = urow_pos[up];
      for (int64_t p = Lp[j]; p < Lp[j + 1]; ++p) {
        const int64_t r = Li[p];
        if (r == j) continue;
        int64_t dst;
        if (r > k)
          dst = posL(r, k);
        else
          dst = posU(r, k);  // includes r == k (pivot cell)
        const int64_t t = lev_fill[l]++;
        res->upd_dst[t] = dst;
        res->upd_L[t] = p;
        res->upd_U[t] = srcU;
        res->upd_lev[t] = l;
      }
    }
  }

  // divisions: L off-diag cells of column k / pivot U(k,k); sort by level
  const int64_t ndiv = lnz - n;
  res->ndiv = ndiv;
  res->div_dst = (int64_t*)std::malloc(std::max<int64_t>(ndiv, 1) * 8);
  res->div_piv = (int64_t*)std::malloc(std::max<int64_t>(ndiv, 1) * 8);
  res->div_lev = (int64_t*)std::malloc(std::max<int64_t>(ndiv, 1) * 8);
  std::vector<int64_t> dcnt(nlev + 1, 0);
  for (int64_t k = 0; k < n; ++k)
    dcnt[lev[k] + 1] += Lp[k + 1] - Lp[k] - 1;
  for (int64_t l = 0; l < nlev; ++l) dcnt[l + 1] += dcnt[l];
  std::vector<int64_t> dfill(dcnt.begin(), dcnt.end() - 1);
  for (int64_t k = 0; k < n; ++k) {
    const int64_t piv = posU(k, k);
    const int64_t l = lev[k];
    for (int64_t p = Lp[k]; p < Lp[k + 1]; ++p)
      if (Li[p] != k) {
        const int64_t t = dfill[l]++;
        res->div_dst[t] = p;
        res->div_piv[t] = piv;
        res->div_lev[t] = l;
      }
  }

  // A -> X scatter map
  std::vector<int64_t> pinv(n), qinv(n);
  for (int64_t k = 0; k < n; ++k) {
    pinv[perm_r[k]] = k;
    qinv[q[k]] = k;
  }
  res->a_dst = (int64_t*)std::malloc(std::max<int64_t>(a_nnz, 1) * 8);
  {
    int64_t t = 0;
    for (int64_t c = 0; c < n; ++c) {
      const int64_t k = qinv[c];
      for (int64_t p = Ap[c]; p < Ap[c + 1]; ++p, ++t) {
        const int64_t pr = pinv[Ai[p]];
        res->a_dst[t] = (pr <= k) ? posU(pr, k) : posL(pr, k);
      }
    }
  }
  return res;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Two-phase CSC SpGEMM (Gustavson), real and complex.  Mirrors the
// reference's csc_matmat_pass1/pass2 delegation (src/sparsetools/csc.h:116)
// but emits canonical (row-sorted, duplicate-free) columns directly.
// ---------------------------------------------------------------------------

namespace {

template <typename T>
int64_t spgemm_pass1(int64_t m, const int64_t* Ap, const int64_t* Ai,
                     int64_t nB, const int64_t* Bp, const int64_t* Bi,
                     int64_t* Cp) {
  std::vector<int64_t> mask(m, -1);
  int64_t nnz = 0;
  Cp[0] = 0;
  for (int64_t j = 0; j < nB; ++j) {
    int64_t cnt = 0;
    for (int64_t pb = Bp[j]; pb < Bp[j + 1]; ++pb) {
      const int64_t k = Bi[pb];
      for (int64_t pa = Ap[k]; pa < Ap[k + 1]; ++pa) {
        const int64_t r = Ai[pa];
        if (mask[r] != j) {
          mask[r] = j;
          ++cnt;
        }
      }
    }
    nnz += cnt;
    Cp[j + 1] = nnz;
  }
  return nnz;
}

template <typename T>
void spgemm_pass2(int64_t m, const int64_t* Ap, const int64_t* Ai,
                  const T* Ax, int64_t nB, const int64_t* Bp,
                  const int64_t* Bi, const T* Bx, const int64_t* Cp,
                  int64_t* Ci, T* Cx) {
  std::vector<int64_t> mask(m, -1);
  std::vector<T> acc(m, T(0));
  for (int64_t j = 0; j < nB; ++j) {
    int64_t head = Cp[j];
    for (int64_t pb = Bp[j]; pb < Bp[j + 1]; ++pb) {
      const int64_t k = Bi[pb];
      const T bv = Bx[pb];
      for (int64_t pa = Ap[k]; pa < Ap[k + 1]; ++pa) {
        const int64_t r = Ai[pa];
        if (mask[r] != j) {
          mask[r] = j;
          Ci[head++] = r;
          acc[r] = Ax[pa] * bv;
        } else {
          acc[r] += Ax[pa] * bv;
        }
      }
    }
    std::sort(Ci + Cp[j], Ci + Cp[j + 1]);
    for (int64_t p = Cp[j]; p < Cp[j + 1]; ++p) Cx[p] = acc[Ci[p]];
  }
}

}  // namespace

extern "C" {

int64_t csc_spgemm_size(int64_t m, const int64_t* Ap, const int64_t* Ai,
                        int64_t nB, const int64_t* Bp, const int64_t* Bi,
                        int64_t* Cp) {
  return spgemm_pass1<double>(m, Ap, Ai, nB, Bp, Bi, Cp);
}

void csc_spgemm_numeric_d(int64_t m, const int64_t* Ap, const int64_t* Ai,
                          const double* Ax, int64_t nB, const int64_t* Bp,
                          const int64_t* Bi, const double* Bx,
                          const int64_t* Cp, int64_t* Ci, double* Cx) {
  spgemm_pass2<double>(m, Ap, Ai, Ax, nB, Bp, Bi, Bx, Cp, Ci, Cx);
}

void csc_spgemm_numeric_z(int64_t m, const int64_t* Ap, const int64_t* Ai,
                          const void* Ax, int64_t nB, const int64_t* Bp,
                          const int64_t* Bi, const void* Bx,
                          const int64_t* Cp, int64_t* Ci, void* Cx) {
  spgemm_pass2<cplx>(m, Ap, Ai, (const cplx*)Ax, nB, Bp, Bi,
                     (const cplx*)Bx, Cp, Ci, (cplx*)Cx);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// CSC transpose via count-cumsum-scatter (reference: csr_tocsc,
// src/sparsetools/csr.h:418-461) — O(nnz), no sort.
// ---------------------------------------------------------------------------

namespace {

template <typename T>
void transpose_impl(int64_t m, int64_t n, const int64_t* Ap, const int64_t* Ai,
                    const T* Ax, int64_t* Tp, int64_t* Ti, T* Tx) {
  const int64_t nnz = Ap[n];
  std::memset(Tp, 0, (m + 1) * sizeof(int64_t));
  for (int64_t p = 0; p < nnz; ++p) Tp[Ai[p] + 1]++;
  for (int64_t r = 0; r < m; ++r) Tp[r + 1] += Tp[r];
  std::vector<int64_t> fill(Tp, Tp + m);
  for (int64_t c = 0; c < n; ++c)
    for (int64_t p = Ap[c]; p < Ap[c + 1]; ++p) {
      const int64_t t = fill[Ai[p]]++;
      Ti[t] = c;
      Tx[t] = Ax[p];
    }
}

}  // namespace

extern "C" {

void csc_transpose_d(int64_t m, int64_t n, const int64_t* Ap,
                     const int64_t* Ai, const double* Ax, int64_t* Tp,
                     int64_t* Ti, double* Tx) {
  transpose_impl<double>(m, n, Ap, Ai, Ax, Tp, Ti, Tx);
}

void csc_transpose_z(int64_t m, int64_t n, const int64_t* Ap,
                     const int64_t* Ai, const void* Ax, int64_t* Tp,
                     int64_t* Ti, void* Tx) {
  transpose_impl<cplx>(m, n, Ap, Ai, (const cplx*)Ax, Tp, Ti, (cplx*)Tx);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Reverse Cuthill-McKee ordering (native twin of linalg/ordering.py::rcm).
// BFS from a George-Liu pseudo-peripheral node per component, neighbors
// visited in increasing-degree order, result reversed.  Tie-breaking may
// differ from the Python implementation; only the bandwidth profile is
// contractual.
// ---------------------------------------------------------------------------

namespace {

// Symmetrize the pattern of a square CSC into a deduped adjacency
// (ptr, adj), no self loops, each list sorted ascending.
void symmetrize_adj(int64_t n, const int64_t* Ap, const int64_t* Ai,
                    std::vector<int64_t>& ptr, std::vector<int64_t>& adj) {
  std::vector<int64_t> cnt(n, 0);
  for (int64_t c = 0; c < n; ++c)
    for (int64_t p = Ap[c]; p < Ap[c + 1]; ++p) {
      const int64_t r = Ai[p];
      if (r != c) {
        cnt[r]++;
        cnt[c]++;
      }
    }
  ptr.assign(n + 1, 0);
  for (int64_t i = 0; i < n; ++i) ptr[i + 1] = ptr[i] + cnt[i];
  std::vector<int64_t> raw(ptr[n]);
  std::vector<int64_t> fill(ptr.begin(), ptr.end() - 1);
  for (int64_t c = 0; c < n; ++c)
    for (int64_t p = Ap[c]; p < Ap[c + 1]; ++p) {
      const int64_t r = Ai[p];
      if (r != c) {
        raw[fill[r]++] = c;
        raw[fill[c]++] = r;
      }
    }
  // dedup per list (sort + unique), rebuild compactly
  adj.clear();
  adj.reserve(raw.size());
  std::vector<int64_t> newptr(n + 1, 0);
  for (int64_t i = 0; i < n; ++i) {
    const int64_t lo = ptr[i], hi = fill[i];
    std::sort(raw.begin() + lo, raw.begin() + hi);
    int64_t prev = -1;
    for (int64_t p = lo; p < hi; ++p)
      if (raw[p] != prev) {
        adj.push_back(raw[p]);
        prev = raw[p];
      }
    newptr[i + 1] = (int64_t)adj.size();
  }
  ptr.swap(newptr);
}

}  // namespace

extern "C" {

void rcm_order(int64_t n, const int64_t* Ap, const int64_t* Ai,
               int64_t* perm_out) {
  std::vector<int64_t> ptr, adj;
  symmetrize_adj(n, Ap, Ai, ptr, adj);
  std::vector<int64_t> deg(n);
  for (int64_t i = 0; i < n; ++i) deg[i] = ptr[i + 1] - ptr[i];

  std::vector<char> visited(n, 0);
  std::vector<int64_t> order;
  order.reserve(n);
  std::vector<int64_t> level(n, -1);
  std::vector<int64_t> frontier, nxt, scratch;

  // component seeds in (degree, id) order
  std::vector<int64_t> seeds(n);
  std::iota(seeds.begin(), seeds.end(), 0);
  std::stable_sort(seeds.begin(), seeds.end(),
                   [&](int64_t a, int64_t b) { return deg[a] < deg[b]; });

  // BFS level structure from u over the unvisited component; returns
  // (depth, farthest-min-degree node); stamps `level` with `stamp`.
  auto bfs_far = [&](int64_t u, int64_t stamp, int64_t* out_far) -> int64_t {
    frontier.clear();
    frontier.push_back(u);
    level[u] = stamp;
    int64_t depth = 0;
    int64_t far = u;
    while (true) {
      nxt.clear();
      for (const int64_t v : frontier)
        for (int64_t p = ptr[v]; p < ptr[v + 1]; ++p) {
          const int64_t w = adj[p];
          if (!visited[w] && level[w] != stamp) {
            level[w] = stamp;
            nxt.push_back(w);
          }
        }
      if (nxt.empty()) break;
      ++depth;
      frontier.swap(nxt);
    }
    // farthest level is in `frontier`; min degree wins
    far = frontier[0];
    for (const int64_t v : frontier)
      if (deg[v] < deg[far]) far = v;
    *out_far = far;
    return depth;
  };

  int64_t stamp = 0;
  size_t seed_ptr = 0;
  while ((int64_t)order.size() < n) {
    while (visited[seeds[seed_ptr]]) ++seed_ptr;
    // George-Liu pseudo-peripheral node
    int64_t u = seeds[seed_ptr];
    int64_t last_ecc = -1;
    for (int iter = 0; iter < 16; ++iter) {
      int64_t far;
      const int64_t ecc = bfs_far(u, ++stamp, &far);
      if (ecc <= last_ecc) break;
      last_ecc = ecc;
      u = far;
    }
    // Cuthill-McKee BFS from u
    const size_t head0 = order.size();
    order.push_back(u);
    visited[u] = 1;
    size_t head = head0;
    while (head < order.size()) {
      const int64_t v = order[head++];
      scratch.clear();
      for (int64_t p = ptr[v]; p < ptr[v + 1]; ++p) {
        const int64_t w = adj[p];
        if (!visited[w]) {
          visited[w] = 1;
          scratch.push_back(w);
        }
      }
      std::stable_sort(scratch.begin(), scratch.end(),
                       [&](int64_t a, int64_t b) { return deg[a] < deg[b]; });
      for (const int64_t w : scratch) order.push_back(w);
    }
  }
  for (int64_t i = 0; i < n; ++i) perm_out[i] = order[n - 1 - i];
}

}  // extern "C"
