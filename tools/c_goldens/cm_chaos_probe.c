#include <stdio.h>
#include <math.h>
#include <string.h>
#include "saf.h"
int main(void){
    int nX = 6, nY = 2;
    void *hCDF;
    cdf4sap_cmplx_create(&hCDF, nX, nY);
    unsigned s = 777u;
    #define RND ((s = s*1103515245u + 12345u), ((float)((s>>8)&0xFFFF)/65536.0f - 0.5f)*2.0f)
    for (int trial = 0; trial < 6; trial++) {
        /* near-rank-1 SCM: a a^H + eps*noise (hermitian) */
        float_complex a[6], Cx[36], Cx2[36], Cy[4], Q[12], M1[12], M2[12];
        for (int i = 0; i < 6; i++) a[i] = cmplxf(RND, RND);
        float eps = (trial < 3) ? 1e-6f : 1e-3f;   /* rank-1-ness severity */
        for (int i = 0; i < 6; i++) for (int j = 0; j < 6; j++) {
            float_complex v = ccmulf(a[i], conjf(a[j]));
            float nr = (i==j) ? fabsf(RND)*eps : 0.0f;
            Cx[i*6+j] = craddf(v, nr);
        }
        /* realistic Cy (2x2 hermitian, direct+diffuse-ish) */
        Cy[0] = cmplxf(0.8f, 0.0f); Cy[3] = cmplxf(0.7f, 0.0f);
        Cy[1] = cmplxf(0.3f, 0.1f); Cy[2] = conjf(Cy[1]);
        for (int i = 0; i < 12; i++) Q[i] = cmplxf(RND*0.5f, RND*0.5f);
        memcpy(Cx2, Cx, sizeof(Cx));
        /* 1-ulp perturbation of one off-diagonal pair */
        Cx2[1] = cmplxf(nextafterf(crealf(Cx[1]), 2.0f), cimagf(Cx[1]));
        Cx2[6] = conjf(Cx2[1]);
        formulate_M_and_Cr_cmplx(hCDF, Cx, Cy, Q, 0, 0.1f, M1, NULL);
        formulate_M_and_Cr_cmplx(hCDF, Cx2, Cy, Q, 0, 0.1f, M2, NULL);
        float dmax = 0.0f, mmax = 0.0f;
        for (int i = 0; i < 12; i++) {
            float d = cabsf(ccsubf(M1[i], M2[i]));
            float m = cabsf(M1[i]);
            if (d > dmax) dmax = d;
            if (m > mmax) mmax = m;
        }
        printf("trial %d eps=%g: |M|max=%g  1-ulp dM=%g (rel %g)\n",
               trial, eps, mmax, dmax, dmax/mmax);
    }
    return 0;
}
