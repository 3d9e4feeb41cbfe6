/* Golden-fixture generator, part 9: binauraliser_nf (distance-dependent
 * DVF near-field rendering) and the decorrelator example (whose lattice
 * delays come from unseeded rand() — output parity is at the energy level,
 * so the golden carries the C's per-channel output for statistical
 * comparison plus the deterministic input).
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

#include "saf.h"
#include "binauraliser_nf.h"
#include "decorrelator.h"
#include "ambi_roomsim.h"

static FILE* manifest;
static const char* outdir;

static void dump(const char* name, const void* data, size_t n_elem,
                 const char* dtype, const char* shape)
{
    char path[512];
    size_t esz = strcmp(dtype, "c8") == 0 ? 8 :
                 strcmp(dtype, "c16") == 0 ? 16 :
                 strcmp(dtype, "f8") == 0 ? 8 : 4;
    snprintf(path, sizeof(path), "%s/%s.bin", outdir, name);
    FILE* f = fopen(path, "wb");
    if (!f) { perror(path); exit(1); }
    fwrite(data, esz, n_elem, f);
    fclose(f);
    fprintf(manifest, "%s %s %s\n", name, dtype, shape);
}

static unsigned int lcg_state = 99991u;
static float lcg_noise(void)
{
    lcg_state = lcg_state * 1664525u + 1013904223u;
    return (float)(lcg_state >> 8) / 8388608.0f - 1.0f;
}

/* -------------------------------------------------------------------- */
static void golden_binauraliser_nf(void)
{
    const int nSrc = 2, nFrames = 48;
    const int frame = binauraliser_getFrameSize();
    const float sdirs[2][2] = {{35.0f, 12.0f}, {-60.0f, -8.0f}};
    const float dists[2] = {0.35f, 0.8f};
    int i, f;
    void* h;
    binauraliserNF_create(&h);
    binauraliserNF_init(h, 48000);
    binauraliser_setNumSources(h, nSrc);
    for (i = 0; i < nSrc; i++) {
        binauraliser_setSourceAzi_deg(h, i, sdirs[i][0]);
        binauraliser_setSourceElev_deg(h, i, sdirs[i][1]);
        binauraliserNF_setSourceDist_m(h, i, dists[i]);
    }
    binauraliser_setUseDefaultHRIRsflag(h, 1);
    binauraliser_setEnableRotation(h, 0);
    binauraliser_setInterpMode(h, INTERP_TRI);
    binauraliserNF_initCodec(h);

    float** in = (float**)malloc2d(nSrc, nFrames * frame, sizeof(float));
    float** inF = (float**)malloc2d(nSrc, frame, sizeof(float));
    float** outF = (float**)malloc2d(2, frame, sizeof(float));
    float* out = malloc1d((size_t)2 * nFrames * frame * sizeof(float));
    for (i = 0; i < nSrc; i++)
        for (f = 0; f < nFrames * frame; f++)
            in[i][f] = lcg_noise();
    for (f = 0; f < nFrames; f++) {
        for (i = 0; i < nSrc; i++)
            memcpy(inF[i], &in[i][f * frame], frame * sizeof(float));
        binauraliserNF_process(h, (const float* const*)inF, outF, nSrc, 2,
                               frame);
        for (i = 0; i < 2; i++)
            memcpy(&out[(size_t)i * nFrames * frame + f * frame], outF[i],
                   frame * sizeof(float));
    }
    char sh[32];
    snprintf(sh, sizeof(sh), "%d,%d", nSrc, nFrames * frame);
    dump("bnf_in", FLATTEN2D(in), (size_t)nSrc * nFrames * frame, "f4", sh);
    snprintf(sh, sizeof(sh), "2,%d", nFrames * frame);
    dump("bnf_out", out, (size_t)2 * nFrames * frame, "f4", sh);
    dump("bnf_src_dirs", sdirs, 4, "f4", "2,2");
    dump("bnf_dists", dists, 2, "f4", "2");
    float meta[1] = {(float)frame};
    dump("bnf_frame", meta, 1, "f4", "1");
    binauraliserNF_destroy(&h);
    free(in); free(inF); free(outF); free(out);
}

/* -------------------------------------------------------------------- */
static void golden_decorrelator(void)
{
    const int nCH = 4, nFrames = 64;
    const int frame = decorrelator_getFrameSize();
    int i, f;
    void* h;
    decorrelator_create(&h);
    decorrelator_init(h, 48000);
    decorrelator_setNumberOfChannels(h, nCH);
    decorrelator_setDecorrelationAmount(h, 1.0f);
    decorrelator_setLevelCompensationFlag(h, 0);
    decorrelator_setTransientBypassFlag(h, 0);
    decorrelator_initCodec(h);

    float** in = (float**)malloc2d(nCH, nFrames * frame, sizeof(float));
    float** inF = (float**)malloc2d(nCH, frame, sizeof(float));
    float** outF = (float**)malloc2d(nCH, frame, sizeof(float));
    float* out = malloc1d((size_t)nCH * nFrames * frame * sizeof(float));
    for (i = 0; i < nCH; i++)
        for (f = 0; f < nFrames * frame; f++)
            in[i][f] = lcg_noise();
    for (f = 0; f < nFrames; f++) {
        for (i = 0; i < nCH; i++)
            memcpy(inF[i], &in[i][f * frame], frame * sizeof(float));
        decorrelator_process(h, (const float* const*)inF, outF, nCH, nCH,
                             frame);
        for (i = 0; i < nCH; i++)
            memcpy(&out[(size_t)i * nFrames * frame + f * frame], outF[i],
                   frame * sizeof(float));
    }
    char sh[32];
    snprintf(sh, sizeof(sh), "%d,%d", nCH, nFrames * frame);
    dump("dcr_in", FLATTEN2D(in), (size_t)nCH * nFrames * frame, "f4", sh);
    dump("dcr_out", out, (size_t)nCH * nFrames * frame, "f4", sh);
    float meta[1] = {(float)frame};
    dump("dcr_frame", meta, 1, "f4", "1");
    decorrelator_destroy(&h);
    free(in); free(inF); free(outF); free(out);
}

/* -------------------------------------------------------------------- */
static void golden_ambi_roomsim(void)
{
    /* order 2, 2 sources, 1 SH receiver, reflection order 2, broadband
     * default wall absorption, integer-delay TD echogram application */
    const int order = 2, nsh = 9, nSrc = 2, nFrames = 64;
    const int frame = ambi_roomsim_getFrameSize();
    int i, f;
    void* h;
    ambi_roomsim_create(&h);
    ambi_roomsim_init(h, 48000);
    ambi_roomsim_setOutputOrder(h, order);
    ambi_roomsim_setNormType(h, NORM_N3D);
    ambi_roomsim_setNumSources(h, nSrc);
    ambi_roomsim_setNumReceivers(h, 1);
    ambi_roomsim_setMaxReflectionOrder(h, 2);
    ambi_roomsim_setRoomDimX(h, 10.0f);
    ambi_roomsim_setRoomDimY(h, 7.0f);
    ambi_roomsim_setRoomDimZ(h, 4.0f);
    ambi_roomsim_setSourceX(h, 0, 2.0f);
    ambi_roomsim_setSourceY(h, 0, 3.0f);
    ambi_roomsim_setSourceZ(h, 0, 1.5f);
    ambi_roomsim_setSourceX(h, 1, 4.0f);
    ambi_roomsim_setSourceY(h, 1, 2.0f);
    ambi_roomsim_setSourceZ(h, 1, 1.7f);
    ambi_roomsim_setReceiverX(h, 0, 3.0f);
    ambi_roomsim_setReceiverY(h, 0, 2.5f);
    ambi_roomsim_setReceiverZ(h, 0, 1.6f);

    float** in = (float**)malloc2d(nSrc, nFrames * frame, sizeof(float));
    float** inF = (float**)malloc2d(nSrc, frame, sizeof(float));
    float** outF = (float**)malloc2d(nsh, frame, sizeof(float));
    float* out = malloc1d((size_t)nsh * nFrames * frame * sizeof(float));
    for (i = 0; i < nSrc; i++)
        for (f = 0; f < nFrames * frame; f++)
            in[i][f] = lcg_noise();
    for (f = 0; f < nFrames; f++) {
        for (i = 0; i < nSrc; i++)
            memcpy(inF[i], &in[i][f * frame], frame * sizeof(float));
        ambi_roomsim_process(h, (const float* const*)inF, outF, nSrc, nsh,
                             frame);
        for (i = 0; i < nsh; i++)
            memcpy(&out[(size_t)i * nFrames * frame + f * frame], outF[i],
                   frame * sizeof(float));
    }
    char sh[32];
    snprintf(sh, sizeof(sh), "%d,%d", nSrc, nFrames * frame);
    dump("ars_in", FLATTEN2D(in), (size_t)nSrc * nFrames * frame, "f4", sh);
    snprintf(sh, sizeof(sh), "%d,%d", nsh, nFrames * frame);
    dump("ars_out", out, (size_t)nsh * nFrames * frame, "f4", sh);
    ambi_roomsim_destroy(&h);
    free(in); free(inF); free(outF); free(out);
}

/* -------------------------------------------------------------------- */
static void golden_misc_utils(void)
{
    int i, j;
    /* getSHcomplex order 4 on 24 deterministic dirs */
    const int order = 4, nsh = 25, nd = 24;
    float dirs_rad[24][2];
    for (i = 0; i < nd; i++) {
        dirs_rad[i][0] = -3.0f + 6.0f * (float)i / (float)nd;
        dirs_rad[i][1] = 0.2f + 2.6f * (float)((i * 7) % nd) / (float)nd;
    }
    float_complex* Yc = malloc1d((size_t)nsh * nd * sizeof(float_complex));
    getSHcomplex(order, (float*)dirs_rad, nd, Yc);
    dump("mu_shc_dirs_rad", dirs_rad, 48, "f4", "24,2");
    dump("mu_shc_Y_o4", Yc, (size_t)nsh * nd, "c8", "25,24");
    free(Yc);

    /* rotateAxisCoeffsComplex (order 3 cardioid) */
    float b_n[4];
    beamWeightsCardioid2Spherical(3, b_n);
    float_complex c_nm[16];
    rotateAxisCoeffsComplex(3, b_n, 0.8f, -1.3f, c_nm);
    dump("mu_rot_cnm_cmplx_o3", c_nm, 16, "c8", "16");

    /* checkCondNumberSHTReal on the t-design-9 grid (48 dirs), order 4 */
    {
        float* g48 = (float*)__Tdesign_degree_9_dirs_deg;
        float grad[48][2], cond[5];
        for (i = 0; i < 48; i++) {
            grad[i][0] = g48[2 * i] * (float)M_PI / 180.0f;
            grad[i][1] = (float)M_PI / 2.0f
                - g48[2 * i + 1] * (float)M_PI / 180.0f; /* incl convention */
        }
        checkCondNumberSHTReal(4, (float*)grad, 48, NULL, cond);
        dump("mu_cond_o4", cond, 5, "f4", "5");
    }

    /* cylindrical arrays: modal coeffs + simulated responses */
    const int cord = 3, cb = 10, cs = 8;
    double ckr[10];
    for (i = 0; i < cb; i++)
        ckr[i] = 0.15 * exp((double)i * log(40.0) / 9.0);
    {
        float ckrf[10];
        for (i = 0; i < cb; i++) ckrf[i] = (float)ckr[i];
        dump("mu_cyl_kr", ckrf, cb, "f4", "10");
    }
    double_complex* cbN = malloc1d(cb * (cord + 1) * sizeof(double_complex));
    cylModalCoeffs(cord, ckr, cb, ARRAY_CONSTRUCTION_RIGID, cbN);
    dump("mu_cyl_modal_rigid", cbN, cb * (cord + 1), "c16", "10,4");
    cylModalCoeffs(cord, ckr, cb, ARRAY_CONSTRUCTION_OPEN, cbN);
    dump("mu_cyl_modal_open", cbN, cb * (cord + 1), "c16", "10,4");
    free(cbN);
    float sens_c[8][2];
    for (i = 0; i < cs; i++) {
        sens_c[i][0] = (float)(2.0 * M_PI * i / cs - M_PI);
        sens_c[i][1] = 0.0f;
    }
    const float csrc[3][2] = {{10.0f, 0.0f}, {-75.0f, 0.0f}, {140.0f, 0.0f}};
    float_complex* Hc = malloc1d((size_t)cb * cs * 3 * sizeof(float_complex));
    simulateCylArray(cord, ckr, cb, (float*)sens_c, cs, (float*)csrc, 3,
                     ARRAY_CONSTRUCTION_RIGID, Hc);
    dump("mu_cyl_sensor_rad", sens_c, 16, "f4", "8,2");
    dump("mu_cyl_src_deg", csrc, 6, "f4", "3,2");
    dump("mu_cyl_H", Hc, (size_t)cb * cs * 3, "c8", "10,8,3");
    free(Hc);

    /* truncationEQ: order 1 truncation of an order-7 target */
    {
        const int nb2 = 12;
        double kr2[12];
        float w_n[2], gain[12];
        for (i = 0; i < nb2; i++)
            kr2[i] = 0.1 * exp((double)i * log(100.0) / 11.0);
        getMaxREweights(1, 0, w_n); /* per-channel; first 2 orders */
        float w_ord[2] = {w_n[0], w_n[1]}; /* order-major entries 0 and 1 */
        truncationEQ(w_ord, 1, 7, kr2, nb2, 12.0f, gain);
        float kr2f[12];
        for (i = 0; i < nb2; i++) kr2f[i] = (float)kr2[i];
        dump("mu_teq_kr", kr2f, nb2, "f4", "12");
        dump("mu_teq_gain", gain, nb2, "f4", "12");
    }

    /* binauralDiffuseCoherence on the default HRIR set */
    {
        void* hFB;
        afSTFT_create(&hFB, 1, 1, 128, 0, 1, AFSTFT_BANDS_CH_TIME);
        int nB = afSTFT_getNBands(hFB);
        float* fv = malloc1d(nB * sizeof(float));
        afSTFT_getCentreFreqs(hFB, 48000.0f, nB, fv);
        afSTFT_destroy(&hFB);
        int nh = __default_N_hrir_dirs, hl = __default_hrir_len;
        float_complex* hfb = malloc1d((size_t)nB * 2 * nh
                                      * sizeof(float_complex));
        HRIRs2HRTFs_afSTFT((float*)__default_hrirs, nh, hl, 128, 0, 1, hfb);
        float* itds = malloc1d(nh * sizeof(float));
        estimateITDs((float*)__default_hrirs, nh, hl, __default_hrir_fs,
                     itds);
        float* coh = malloc1d(nB * sizeof(float));
        binauralDiffuseCoherence(hfb, itds, fv, nh, nB, coh);
        char sh[16];
        snprintf(sh, sizeof(sh), "%d", nB);
        dump("mu_bin_coh", coh, nB, "f4", sh);
        free(fv); free(hfb); free(itds); free(coh);
    }
}

/* -------------------------------------------------------------------- */
int main(int argc, char** argv)
{
    if (argc != 2) { fprintf(stderr, "usage: %s <outdir>\n", argv[0]); return 1; }
    setbuf(stdout, NULL);
    outdir = argv[1];
    char mpath[512];
    snprintf(mpath, sizeof(mpath), "%s/manifest.txt", outdir);
    manifest = fopen(mpath, "a");
    if (!manifest) { perror(mpath); return 1; }

    golden_binauraliser_nf();
    printf("binauraliser_nf goldens done\n");
    golden_decorrelator();
    printf("decorrelator goldens done\n");
    golden_ambi_roomsim();
    printf("ambi_roomsim goldens done\n");
    golden_misc_utils();
    printf("misc util goldens done\n");

    fclose(manifest);
    return 0;
}
