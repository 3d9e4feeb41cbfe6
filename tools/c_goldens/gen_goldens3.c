/* Golden-fixture generator, part 3: loudspeaker decoder matrices, SH-domain
 * DoA estimators (sphPWD/sphMUSIC/sphESPRIT), CDF4SAP optimal mixing,
 * the DVF near-field trio, the Favrot&Faller IIR filterbank and the SMB
 * pitch shifter.  Appends to the same manifest as gen_goldens/gen_goldens2.
 *
 * Recipes mirror the reference's own tests (test__sh_module.c:454-660,
 * test__cdf4sap_module.c, test__utilities_module.c) with deterministic
 * inputs (fixed steering vectors / LCG noise) instead of rand_m1_1.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

#include "saf.h"

static FILE* manifest;
static const char* outdir;

static void dump(const char* name, const void* data, size_t n_elem,
                 const char* dtype, const char* shape)
{
    char path[512];
    size_t esz = strcmp(dtype, "c8") == 0 ? 8 : 4;
    snprintf(path, sizeof(path), "%s/%s.bin", outdir, name);
    FILE* f = fopen(path, "wb");
    if (!f) { perror(path); exit(1); }
    fwrite(data, esz, n_elem, f);
    fclose(f);
    fprintf(manifest, "%s %s %s\n", name, dtype, shape);
}

static unsigned int lcg_state = 7654321u;
static float lcg_noise(void)
{
    lcg_state = lcg_state * 1664525u + 1013904223u;
    return (float)(lcg_state >> 8) / 8388608.0f - 1.0f;
}

/* -------------------------------------------------------------------- */
static void golden_ls_decoders(void)
{
    /* generic-position 9-speaker layout (same rationale as the VBAP golden:
     * no coplanar hull quads, so the AllRAD VBAP triangulation is unique) */
    float ls_dirs[9][2] = {
        {0.0f, -3.0f}, {47.0f, 2.0f}, {-42.0f, 1.0f}, {88.0f, -2.0f},
        {-93.0f, 0.0f}, {132.0f, 3.0f}, {-138.0f, -1.0f},
        {30.0f, 40.0f}, {-60.0f, 28.0f}};
    const int order = 3, nsh = 16, nls = 9;
    float* dec = malloc1d(nls * nsh * sizeof(float));
    const LOUDSPEAKER_AMBI_DECODER_METHODS methods[4] = {
        LOUDSPEAKER_DECODER_DEFAULT /* SAD */, LOUDSPEAKER_DECODER_MMD,
        LOUDSPEAKER_DECODER_EPAD, LOUDSPEAKER_DECODER_ALLRAD};
    const char* names[4] = {"sad", "mmd", "epad", "allrad"};
    char key[64];
    int m, maxre;
    dump("lsdec_dirs", (float*)ls_dirs, 18, "f4", "9,2");
    for (m = 0; m < 4; m++) {
        for (maxre = 0; maxre <= 1; maxre++) {
            getLoudspeakerDecoderMtx((float*)ls_dirs, nls, methods[m], order,
                                     maxre, dec);
            snprintf(key, sizeof(key), "lsdec_%s_o3_maxre%d", names[m], maxre);
            dump(key, dec, (size_t)nls * nsh, "f4", "9,16");
        }
    }
    free(dec);
}

/* -------------------------------------------------------------------- */
static void golden_doa_estimators(void)
{
    /* order 3; t-design degree-21 grid (240 dirs); two planted sources at
     * grid indices 139 and 204 with powers 1.0 / 0.7; Cx = Y diag(p) Y^T
     * + 1e-4 I (deterministic — no noise realisation) */
    const int order = 3, nsh = 16, ngrid = 240, nsrc = 2;
    float* grid = (float*)__Tdesign_degree_21_dirs_deg;
    float src_dirs[2][2];
    src_dirs[0][0] = grid[139 * 2]; src_dirs[0][1] = grid[139 * 2 + 1];
    src_dirs[1][0] = grid[204 * 2]; src_dirs[1][1] = grid[204 * 2 + 1];
    float* Y = malloc1d(nsh * nsrc * sizeof(float));
    getRSH(order, (float*)src_dirs, nsrc, Y);
    const float p[2] = {1.0f, 0.7f};
    float* Cx = calloc1d(nsh * nsh, sizeof(float));
    int i, j, k;
    for (i = 0; i < nsh; i++)
        for (j = 0; j < nsh; j++) {
            for (k = 0; k < nsrc; k++)
                Cx[i * nsh + j] += p[k] * Y[i * nsrc + k] * Y[j * nsrc + k];
            if (i == j)
                Cx[i * nsh + j] += 1e-4f;
        }
    dump("doa_Cx", Cx, (size_t)nsh * nsh, "f4", "16,16");
    float_complex* Cx_c = malloc1d(nsh * nsh * sizeof(float_complex));
    for (i = 0; i < nsh * nsh; i++)
        Cx_c[i] = cmplxf(Cx[i], 0.0f);

    /* sphPWD */
    void* hPWD;
    sphPWD_create(&hPWD, order, grid, ngrid);
    float* P_map = malloc1d(ngrid * sizeof(float));
    int peak_inds[2];
    sphPWD_compute(hPWD, Cx_c, nsrc, P_map, peak_inds);
    dump("doa_pwd_map", P_map, ngrid, "f4", "240");
    float pk[2] = {(float)peak_inds[0], (float)peak_inds[1]};
    dump("doa_pwd_peaks", pk, 2, "f4", "2");
    sphPWD_destroy(&hPWD);

    /* sphMUSIC (noise subspace from utility_sseig, as in test__sphMUSIC) */
    float* V = malloc1d(nsh * nsh * sizeof(float));
    float* Cx_copy = malloc1d(nsh * nsh * sizeof(float));
    memcpy(Cx_copy, Cx, nsh * nsh * sizeof(float));
    utility_sseig(NULL, Cx_copy, nsh, 1, V, NULL, NULL);
    float_complex* Vn = malloc1d(nsh * (nsh - nsrc) * sizeof(float_complex));
    for (i = 0; i < nsh; i++)
        for (j = 0; j < nsh - nsrc; j++)
            Vn[i * (nsh - nsrc) + j] = cmplxf(V[i * nsh + j + nsrc], 0.0f);
    void* hMUSIC;
    sphMUSIC_create(&hMUSIC, order, grid, ngrid);
    float* P_music = malloc1d(ngrid * sizeof(float));
    sphMUSIC_compute(hMUSIC, Vn, nsrc, P_music, peak_inds);
    dump("doa_music_map", P_music, ngrid, "f4", "240");
    pk[0] = (float)peak_inds[0]; pk[1] = (float)peak_inds[1];
    dump("doa_music_peaks", pk, 2, "f4", "2");
    sphMUSIC_destroy(&hMUSIC);

    /* sphESPRIT (signal subspace from utility_cseig of complex Cx) */
    float_complex* Vc = malloc1d(nsh * nsh * sizeof(float_complex));
    float_complex* Cxc_copy = malloc1d(nsh * nsh * sizeof(float_complex));
    memcpy(Cxc_copy, Cx_c, nsh * nsh * sizeof(float_complex));
    utility_cseig(NULL, Cxc_copy, nsh, 1, Vc, NULL, NULL);
    float_complex* Us = malloc1d(nsh * nsrc * sizeof(float_complex));
    for (i = 0; i < nsh; i++)
        for (j = 0; j < nsrc; j++)
            Us[i * nsrc + j] = Vc[i * nsh + j];
    void* hESPRIT;
    sphESPRIT_create(&hESPRIT, order);
    float dirs_rad[4];
    sphESPRIT_estimateDirs(hESPRIT, Us, nsrc, dirs_rad);
    dump("doa_esprit_dirs_rad", dirs_rad, 4, "f4", "2,2");
    dump("doa_src_dirs_deg", (float*)src_dirs, 4, "f4", "2,2");
    sphESPRIT_destroy(&hESPRIT);

    free(Y); free(Cx); free(Cx_c); free(V); free(Cx_copy); free(Vn);
    free(P_map); free(P_music); free(Vc); free(Cxc_copy); free(Us);
}

/* -------------------------------------------------------------------- */
static void golden_cdf4sap(void)
{
    const int nX = 6, nY = 4;
    int i, j, k, e;
    /* real variant */
    float A[6 * 6], B[4 * 4], Q[4 * 6], Cx[6 * 6], Cy[4 * 4];
    for (i = 0; i < 36; i++) A[i] = lcg_noise();
    for (i = 0; i < 16; i++) B[i] = lcg_noise();
    for (i = 0; i < 24; i++) Q[i] = lcg_noise();
    for (i = 0; i < nX; i++)
        for (j = 0; j < nX; j++) {
            Cx[i * nX + j] = 0.0f;
            for (k = 0; k < nX; k++)
                Cx[i * nX + j] += A[i * nX + k] * A[j * nX + k];
        }
    for (i = 0; i < nY; i++)
        for (j = 0; j < nY; j++) {
            Cy[i * nY + j] = 0.0f;
            for (k = 0; k < nY; k++)
                Cy[i * nY + j] += B[i * nY + k] * B[j * nY + k];
        }
    dump("cdf_Cx", Cx, 36, "f4", "6,6");
    dump("cdf_Cy", Cy, 16, "f4", "4,4");
    dump("cdf_Q", Q, 24, "f4", "4,6");
    void* h;
    cdf4sap_create(&h, nX, nY);
    float M[4 * 6], Cr[4 * 4];
    for (e = 0; e <= 1; e++) {
        formulate_M_and_Cr(h, Cx, Cy, Q, e, 0.01f, M, Cr);
        dump(e ? "cdf_M_energy" : "cdf_M", M, 24, "f4", "4,6");
        dump(e ? "cdf_Cr_energy" : "cdf_Cr", Cr, 16, "f4", "4,4");
    }
    cdf4sap_destroy(&h);

    /* complex variant */
    float_complex Ac[6 * 6], Bc[4 * 4], Qc[4 * 6], Cxc[6 * 6], Cyc[4 * 4];
    for (i = 0; i < 36; i++) Ac[i] = cmplxf(lcg_noise(), lcg_noise());
    for (i = 0; i < 16; i++) Bc[i] = cmplxf(lcg_noise(), lcg_noise());
    for (i = 0; i < 24; i++) Qc[i] = cmplxf(lcg_noise(), lcg_noise());
    for (i = 0; i < nX; i++)
        for (j = 0; j < nX; j++) {
            Cxc[i * nX + j] = cmplxf(0.0f, 0.0f);
            for (k = 0; k < nX; k++)
                Cxc[i * nX + j] = ccaddf(Cxc[i * nX + j],
                    ccmulf(Ac[i * nX + k], conjf(Ac[j * nX + k])));
        }
    for (i = 0; i < nY; i++)
        for (j = 0; j < nY; j++) {
            Cyc[i * nY + j] = cmplxf(0.0f, 0.0f);
            for (k = 0; k < nY; k++)
                Cyc[i * nY + j] = ccaddf(Cyc[i * nY + j],
                    ccmulf(Bc[i * nY + k], conjf(Bc[j * nY + k])));
        }
    dump("cdf_Cx_c", Cxc, 36, "c8", "6,6");
    dump("cdf_Cy_c", Cyc, 16, "c8", "4,4");
    dump("cdf_Q_c", Qc, 24, "c8", "4,6");
    void* hc;
    cdf4sap_cmplx_create(&hc, nX, nY);
    float_complex Mc[4 * 6], Crc[4 * 4];
    for (e = 0; e <= 1; e++) {
        formulate_M_and_Cr_cmplx(hc, Cxc, Cyc, Qc, e, 0.01f, Mc, Crc);
        dump(e ? "cdf_M_c_energy" : "cdf_M_c", Mc, 24, "c8", "4,6");
        dump(e ? "cdf_Cr_c_energy" : "cdf_Cr_c", Crc, 16, "c8", "4,4");
    }
    cdf4sap_cmplx_destroy(&hc);
}

/* -------------------------------------------------------------------- */
static void golden_dvf(void)
{
    const float alphas[4] = {0.0f, 30.0f, 90.0f, 150.0f};
    const float rhos[3] = {1.2f, 2.0f, 4.0f};
    const float fs = 48000.0f;
    float b[2], a[2], out_ba[4 * 3 * 4];
    float params[4 * 3 * 3];
    int i, j;
    for (i = 0; i < 4; i++)
        for (j = 0; j < 3; j++) {
            float g0, gInf, fc;
            interpDVFShelfParams(alphas[i], rhos[j], &g0, &gInf, &fc);
            params[(i * 3 + j) * 3 + 0] = g0;
            params[(i * 3 + j) * 3 + 1] = gInf;
            params[(i * 3 + j) * 3 + 2] = fc;
            a[0] = 0.0f;  /* C writes only a[1] */
            calcDVFCoeffs(alphas[i], rhos[j], fs, b, a);
            out_ba[(i * 3 + j) * 4 + 0] = b[0];
            out_ba[(i * 3 + j) * 4 + 1] = b[1];
            out_ba[(i * 3 + j) * 4 + 2] = a[0];
            out_ba[(i * 3 + j) * 4 + 3] = a[1];
        }
    dump("dvf_params", params, 36, "f4", "4,3,3");
    dump("dvf_ba", out_ba, 48, "f4", "4,3,4");
}

/* -------------------------------------------------------------------- */
static void golden_faf(void)
{
    float fc[5] = {250.0f, 500.0f, 1000.0f, 2000.0f, 4000.0f};
    const int nband = 6, T = 2048;
    float* in = malloc1d(T * sizeof(float));
    int i;
    for (i = 0; i < T; i++)
        in[i] = lcg_noise();
    in[0] += 1.0f;
    void* h;
    faf_IIRFilterbank_create(&h, 3, fc, 5, 48000.0f, T);
    float** out = (float**)malloc2d(nband, T, sizeof(float));
    faf_IIRFilterbank_apply(h, in, out, T);
    dump("faf_in", in, T, "f4", "2048");
    dump("faf_out_o3", FLATTEN2D(out), (size_t)nband * T, "f4", "6,2048");
    faf_IIRFilterbank_destroy(&h);
    free(in); free(out);
}

/* -------------------------------------------------------------------- */
static void golden_pitch(void)
{
    const int T = 8192, fftsize = 4096, osamp = 4;
    float* in = malloc1d(T * sizeof(float));
    float* out = malloc1d(T * sizeof(float));
    int i;
    for (i = 0; i < T; i++)
        in[i] = 0.5f * sinf(2.0f * (float)M_PI * 220.5f * i / 48000.0f);
    void* h;
    smb_pitchShift_create(&h, 1, fftsize, osamp, 48000.0f);
    smb_pitchShift_apply(h, 1.5f, T, in, out);
    dump("pitch_in", in, T, "f4", "8192");
    dump("pitch_out_1p5", out, T, "f4", "8192");
    smb_pitchShift_destroy(&h);
    free(in); free(out);
}

/* -------------------------------------------------------------------- */
int main(int argc, char** argv)
{
    if (argc != 2) { fprintf(stderr, "usage: %s <outdir>\n", argv[0]); return 1; }
    outdir = argv[1];
    char mpath[512];
    snprintf(mpath, sizeof(mpath), "%s/manifest.txt", outdir);
    manifest = fopen(mpath, "a");
    if (!manifest) { perror(mpath); return 1; }

    golden_ls_decoders();
    printf("ls decoder goldens done\n");
    golden_doa_estimators();
    printf("doa estimator goldens done\n");
    golden_cdf4sap();
    printf("cdf4sap goldens done\n");
    golden_dvf();
    printf("dvf goldens done\n");
    golden_faf();
    printf("faf goldens done\n");
    golden_pitch();
    printf("pitch goldens done\n");

    fclose(manifest);
    return 0;
}
