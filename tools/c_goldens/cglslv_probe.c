#include <stdio.h>
#include <stdlib.h>
#include "saf.h"
int main(void){
    /* deterministic LCG inputs, f32 */
    unsigned s = 12345u;
    #define RND ((s = s*1103515245u + 12345u), ((float)((s>>8)&0xFFFF)/65536.0f - 0.5f)*2.0f)
    int n = 6, t;
    for (t = 0; t < 8; t++) {
        float_complex A[36], b[6];
        for (int i = 0; i < 36; i++) A[i] = cmplxf(RND, RND);
        for (int i = 0; i < 6; i++)  b[i] = cmplxf(RND, RND);
        /* print inputs */
        for (int i = 0; i < 36; i++) printf("%a %a ", crealf(A[i]), cimagf(A[i]));
        for (int i = 0; i < 6; i++)  printf("%a %a ", crealf(b[i]), cimagf(b[i]));
        float_complex x[6];
        utility_cglslv(NULL, A, n, b, 1, x);
        for (int i = 0; i < 6; i++)  printf("%a %a ", crealf(x[i]), cimagf(x[i]));
        printf("\n");
    }
    return 0;
}
