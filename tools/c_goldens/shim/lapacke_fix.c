/* Link-order override fixing an upstream SAF bug in its LAPACKE build path:
 * saf_utility_veclib.c passes the CBLAS enum CblasUpper (=121, i.e. 'y') as
 * the LAPACKE `uplo` argument of the ?posv/?potrf families
 * (saf_utility_veclib.c:3293,3395,4047,4135), so LAPACK rejects the call and
 * utility_?slslv / utility_?chol silently return zeros.  Linking this object
 * before OpenBLAS resolves libsaf's references here instead; we translate the
 * enum to the character LAPACK expects and forward to the Fortran symbols
 * (layout is always column-major at these call sites, so no transposition is
 * needed).  This restores the reference's INTENDED behaviour for golden
 * generation — its MKL/Accelerate CI builds use the Fortran interface and
 * never hit the bug. */
#include <complex.h>

extern void sposv_(const char* uplo, const int* n, const int* nrhs, float* a,
                   const int* lda, float* b, const int* ldb, int* info);
extern void cposv_(const char* uplo, const int* n, const int* nrhs,
                   float _Complex* a, const int* lda, float _Complex* b,
                   const int* ldb, int* info);
extern void spotrf_(const char* uplo, const int* n, float* a, const int* lda,
                    int* info);
extern void cpotrf_(const char* uplo, const int* n, float _Complex* a,
                    const int* lda, int* info);

static char fix_uplo(char u)
{
    if (u == 121) return 'U';   /* CblasUpper */
    if (u == 122) return 'L';   /* CblasLower */
    return u;
}

int LAPACKE_sposv_work(int layout, char uplo, int n, int nrhs, float* a,
                       int lda, float* b, int ldb)
{
    int info = 0;
    char u = fix_uplo(uplo);
    (void)layout;
    sposv_(&u, &n, &nrhs, a, &lda, b, &ldb, &info);
    return info;
}

int LAPACKE_cposv_work(int layout, char uplo, int n, int nrhs,
                       float _Complex* a, int lda, float _Complex* b, int ldb)
{
    int info = 0;
    char u = fix_uplo(uplo);
    (void)layout;
    cposv_(&u, &n, &nrhs, a, &lda, b, &ldb, &info);
    return info;
}

int LAPACKE_spotrf_work(int layout, char uplo, int n, float* a, int lda)
{
    int info = 0;
    char u = fix_uplo(uplo);
    (void)layout;
    spotrf_(&u, &n, a, &lda, &info);
    return info;
}

int LAPACKE_cpotrf_work(int layout, char uplo, int n, float _Complex* a,
                        int lda)
{
    int info = 0;
    char u = fix_uplo(uplo);
    (void)layout;
    cpotrf_(&u, &n, a, &lda, &info);
    return info;
}
