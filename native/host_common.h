// Shared declarations between host_ext.cpp (scalar GP LU, orderings,
// SpGEMM, ...) and lu_sn.cpp (supernodal multifrontal LU).
#pragma once

#include <complex>
#include <cstddef>
#include <cstdint>

using cplx = std::complex<double>;

// ---------------------------------------------------------------------------
// Runtime-loaded BLAS/LAPACK (from scipy's bundled OpenBLAS; see
// host_ext.py::_load_blas).  32-bit Fortran ints, reference signatures.
// ---------------------------------------------------------------------------

using getrf_d_t = void (*)(const int*, const int*, double*, const int*, int*,
                           int*);
using getrf_z_t = void (*)(const int*, const int*, void*, const int*, int*,
                           int*);
using gemm_d_t = void (*)(const char*, const char*, const int*, const int*,
                          const int*, const double*, const double*, const int*,
                          const double*, const int*, const double*, double*,
                          const int*);
using gemm_z_t = void (*)(const char*, const char*, const int*, const int*,
                          const int*, const void*, const void*, const int*,
                          const void*, const int*, const void*, void*,
                          const int*);
using trsm_d_t = void (*)(const char*, const char*, const char*, const char*,
                          const int*, const int*, const double*, const double*,
                          const int*, double*, const int*);
using trsm_z_t = void (*)(const char*, const char*, const char*, const char*,
                          const int*, const int*, const void*, const void*,
                          const int*, void*, const int*);

struct BlasFns {
  getrf_d_t dgetrf = nullptr;
  getrf_z_t zgetrf = nullptr;
  gemm_d_t dgemm = nullptr;
  gemm_z_t zgemm = nullptr;
  trsm_d_t dtrsm = nullptr;
  trsm_z_t ztrsm = nullptr;
  bool ok() const { return dgetrf && zgetrf; }
  bool ok3() const { return ok() && dgemm && zgemm && dtrsm && ztrsm; }
};
extern BlasFns g_blas;

// Populated anonymous mmap for large scratch (see native/npalloc.c: demand
// faults are pathological on sandboxed kernels).
void* pop_alloc_raw(size_t bytes, bool* mapped);
void pop_free_raw(void* p, size_t bytes, bool mapped);

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

void lu_free(LUResult* r);

struct LDLTResult {
  int64_t n;
  int64_t lnz;    // entries of L including the stored unit diagonal
  int64_t nsing;  // columns with an exactly-zero pivot d[k]
  int64_t* Lp;
  int64_t* Li;
  int64_t* sing;
  void* Lx;
  void* D;
};

void ldlt_free(LDLTResult* r);

}  // extern "C"
