/* Minimal MKL shim: the 14 cblas/LAPACKE/service entry points the
 * reference (bee-hive/MedGP medgpc/src) actually calls, implemented over
 * the system f77 BLAS/LAPACK (libblas.so.3 / liblapack.so.3).
 *
 * Scope is deliberately exact: every call site in the reference uses
 * CblasRowMajor / LAPACK_ROW_MAJOR, so only the row-major->f77
 * (column-major) translations needed by those sites are implemented;
 * anything else aborts loudly.  This exists so the reference binaries
 * (main_one_train / main_one_test) can be BUILT AND RUN in this
 * environment for executable-level parity testing against medgp_tpu —
 * it is not a general BLAS wrapper.
 *
 * Entry points covered (audited over medgpc/src with grep):
 *   cblas_{ddot,dsdot,sdsdot,scopy,sscal,saxpy,sgemv,sgemm,dgemm,strmm}
 *   LAPACKE_{spotrf,spotrs,strtri}
 *   mkl_set_num_threads_local (-> no-op)
 */
#ifndef MEDGP_REFBUILD_MKL_SHIM_H
#define MEDGP_REFBUILD_MKL_SHIM_H

#include <stdio.h>
#include <stdlib.h>

typedef int MKL_INT;
typedef int lapack_int;

/* ---- f77 externs ----------------------------------------------------- */
extern "C" {
double ddot_(const int *n, const double *x, const int *incx,
             const double *y, const int *incy);
double dsdot_(const int *n, const float *x, const int *incx,
              const float *y, const int *incy);
float sdsdot_(const int *n, const float *sb, const float *x,
              const int *incx, const float *y, const int *incy);
void scopy_(const int *n, const float *x, const int *incx, float *y,
            const int *incy);
void sscal_(const int *n, const float *alpha, float *x, const int *incx);
void saxpy_(const int *n, const float *alpha, const float *x,
            const int *incx, float *y, const int *incy);
void sgemv_(const char *trans, const int *m, const int *n,
            const float *alpha, const float *a, const int *lda,
            const float *x, const int *incx, const float *beta, float *y,
            const int *incy);
void sgemm_(const char *ta, const char *tb, const int *m, const int *n,
            const int *k, const float *alpha, const float *a,
            const int *lda, const float *b, const int *ldb,
            const float *beta, float *c, const int *ldc);
void dgemm_(const char *ta, const char *tb, const int *m, const int *n,
            const int *k, const double *alpha, const double *a,
            const int *lda, const double *b, const int *ldb,
            const double *beta, double *c, const int *ldc);
void strmm_(const char *side, const char *uplo, const char *transa,
            const char *diag, const int *m, const int *n,
            const float *alpha, const float *a, const int *lda, float *b,
            const int *ldb);
void spotrf_(const char *uplo, const int *n, float *a, const int *lda,
             int *info);
void spotrs_(const char *uplo, const int *n, const int *nrhs,
             const float *a, const int *lda, float *b, const int *ldb,
             int *info);
void strtri_(const char *uplo, const char *diag, const int *n, float *a,
             const int *lda, int *info);
}

/* ---- CBLAS / LAPACKE surface ----------------------------------------- */
typedef enum { CblasRowMajor = 101, CblasColMajor = 102 } CBLAS_LAYOUT;
typedef enum {
  CblasNoTrans = 111,
  CblasTrans = 112,
  CblasConjTrans = 113
} CBLAS_TRANSPOSE;
typedef enum { CblasUpper = 121, CblasLower = 122 } CBLAS_UPLO;
typedef enum { CblasNonUnit = 131, CblasUnit = 132 } CBLAS_DIAG;
typedef enum { CblasLeft = 141, CblasRight = 142 } CBLAS_SIDE;

#define LAPACK_ROW_MAJOR 101
#define LAPACK_COL_MAJOR 102

static inline void medgp_shim_require(int cond, const char *what) {
  if (!cond) {
    fprintf(stderr, "mkl-shim: unsupported usage: %s\n", what);
    abort();
  }
}

static inline char medgp_shim_transchar(CBLAS_TRANSPOSE t) {
  return t == CblasNoTrans ? 'N' : 'T';
}
/* row-major <-> col-major flips */
static inline char medgp_shim_fliptrans(CBLAS_TRANSPOSE t) {
  return t == CblasNoTrans ? 'T' : 'N';
}
static inline char medgp_shim_flipuplo_c(char u) {
  return u == 'L' || u == 'l' ? 'U' : 'L';
}

/* ---- dot/copy/scale family (layout-free) ----------------------------- */
static inline double cblas_ddot(int n, const double *x, int incx,
                                const double *y, int incy) {
  return ddot_(&n, x, &incx, y, &incy);
}
static inline double cblas_dsdot(int n, const float *x, int incx,
                                 const float *y, int incy) {
  return dsdot_(&n, x, &incx, y, &incy);
}
static inline float cblas_sdsdot(int n, float sb, const float *x, int incx,
                                 const float *y, int incy) {
  return sdsdot_(&n, &sb, x, &incx, y, &incy);
}
static inline void cblas_scopy(int n, const float *x, int incx, float *y,
                               int incy) {
  scopy_(&n, x, &incx, y, &incy);
}
static inline void cblas_sscal(int n, float alpha, float *x, int incx) {
  sscal_(&n, &alpha, x, &incx);
}
static inline void cblas_saxpy(int n, float alpha, const float *x, int incx,
                               float *y, int incy) {
  saxpy_(&n, &alpha, x, &incx, y, &incy);
}

/* ---- gemv: row-major A(m,n) == col-major A^T(n,m); flip trans -------- */
static inline void cblas_sgemv(CBLAS_LAYOUT layout, CBLAS_TRANSPOSE trans,
                               int m, int n, float alpha, const float *a,
                               int lda, const float *x, int incx, float beta,
                               float *y, int incy) {
  medgp_shim_require(layout == CblasRowMajor, "sgemv col-major");
  char t = medgp_shim_fliptrans(trans);
  sgemv_(&t, &n, &m, &alpha, a, &lda, x, &incx, &beta, y, &incy);
}

/* ---- gemm: C_row = op(A)op(B)  ==  C_col^T, so swap operands --------- */
static inline void cblas_sgemm(CBLAS_LAYOUT layout, CBLAS_TRANSPOSE ta,
                               CBLAS_TRANSPOSE tb, int m, int n, int k,
                               float alpha, const float *a, int lda,
                               const float *b, int ldb, float beta, float *c,
                               int ldc) {
  medgp_shim_require(layout == CblasRowMajor, "sgemm col-major");
  char fa = medgp_shim_transchar(ta), fb = medgp_shim_transchar(tb);
  sgemm_(&fb, &fa, &n, &m, &k, &alpha, b, &ldb, a, &lda, &beta, c, &ldc);
}
static inline void cblas_dgemm(CBLAS_LAYOUT layout, CBLAS_TRANSPOSE ta,
                               CBLAS_TRANSPOSE tb, int m, int n, int k,
                               double alpha, const double *a, int lda,
                               const double *b, int ldb, double beta,
                               double *c, int ldc) {
  medgp_shim_require(layout == CblasRowMajor, "dgemm col-major");
  char fa = medgp_shim_transchar(ta), fb = medgp_shim_transchar(tb);
  dgemm_(&fb, &fa, &n, &m, &k, &alpha, b, &ldb, a, &lda, &beta, c, &ldc);
}

/* ---- trmm: B_row := alpha op(A) B_row  ==  B_col^T := B_col^T op(A)^T;
 *      flip side Left<->Right, flip uplo, swap m<->n ------------------- */
static inline void cblas_strmm(CBLAS_LAYOUT layout, CBLAS_SIDE side,
                               CBLAS_UPLO uplo, CBLAS_TRANSPOSE transa,
                               CBLAS_DIAG diag, int m, int n, float alpha,
                               const float *a, int lda, float *b, int ldb) {
  medgp_shim_require(layout == CblasRowMajor, "strmm col-major");
  char s = side == CblasLeft ? 'R' : 'L';
  char u = uplo == CblasLower ? 'U' : 'L';
  char t = medgp_shim_transchar(transa);
  char d = diag == CblasNonUnit ? 'N' : 'U';
  strmm_(&s, &u, &t, &d, &n, &m, &alpha, a, &lda, b, &ldb);
}

/* ---- LAPACKE (row-major only, as used): the row-major buffer read
 *      col-major IS the transpose, so a lower factor becomes upper ----- */
static inline int LAPACKE_spotrf(int layout, char uplo, int n, float *a,
                                 int lda) {
  medgp_shim_require(layout == LAPACK_ROW_MAJOR, "spotrf col-major");
  char u = medgp_shim_flipuplo_c(uplo);
  int info = 0;
  spotrf_(&u, &n, a, &lda, &info);
  return info;
}
static inline int LAPACKE_spotrs(int layout, char uplo, int n, int nrhs,
                                 const float *a, int lda, float *b,
                                 int ldb) {
  medgp_shim_require(layout == LAPACK_ROW_MAJOR, "spotrs col-major");
  /* the reference's only call is nrhs=1, ldb=1: an n-vector, identical
   * memory layout in both conventions with col-major ldb=n */
  medgp_shim_require(nrhs == 1 && ldb == 1, "spotrs nrhs!=1");
  char u = medgp_shim_flipuplo_c(uplo);
  int ldb_col = n > 0 ? n : 1;
  int info = 0;
  spotrs_(&u, &n, &nrhs, a, &lda, b, &ldb_col, &info);
  return info;
}
static inline int LAPACKE_strtri(int layout, char uplo, char diag, int n,
                                 float *a, int lda) {
  medgp_shim_require(layout == LAPACK_ROW_MAJOR, "strtri col-major");
  char u = medgp_shim_flipuplo_c(uplo);
  int info = 0;
  strtri_(&u, &diag, &n, a, &lda, &info);
  return info;
}

/* ---- MKL service ----------------------------------------------------- */
static inline int mkl_set_num_threads_local(int nth) {
  (void)nth; /* reference BLAS is single-threaded; OMP still parallelizes
                the caller's loops via -fopenmp */
  return 0;
}

#endif /* MEDGP_REFBUILD_MKL_SHIM_H */
