/* Golden-fixture generator, part 12: option branches the earlier stages
 * left unpinned —
 *  - binauraliser with head ROTATION engaged (binauraliser.c:229-247:
 *    src_rot_row = src_row @ Rzyx, i.e. the ROW convention; general
 *    yaw/pitch/roll so a transposed rotation cannot pass),
 *  - powermap in PWD and MVDR modes (powermap_internal.c; only MUSIC was
 *    pinned in part 7),
 *  - ambi_bin with the LS decoder (+ its truncation-EQ path,
 *    ambi_bin.c:310-364) under a general rotation, and the TA decoder
 *    (only the default MagLS @ yaw=180 was pinned in part 1 — yaw-180
 *    rotation matrices are symmetric, so that pin cannot catch a
 *    transposed M_rot either),
 *  - dirass in REASS_NEAREST and REASS_MODE_OFF modes (only UPSCALE was
 *    pinned in part 8).
 *
 * The binauraliser golden runs FIRST in this process so its initCodec's
 * convhull_3d triangulation jitter starts at glibc-rand offset 0 (the
 * rebuild's default design() models exactly that).
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

#include "saf.h"
#include "binauraliser.h"
#include "powermap.h"
#include "powermap_internal.h"   /* peek codecPars->interp_table */
#include "ambi_bin.h"
#include "dirass.h"
#include "dirass_internal.h"

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

/* dump a (nRows x nCols) VBAP interpolation table as sparse top-3
 * (index, weight) pairs per row -- each row holds one triangle's gains */
static void dump_itab_sparse(const char* tag_idx, const char* tag_w,
                             const float* tab, int nRows, int nCols)
{
    int r, c, k;
    int* idx = malloc1d((size_t)nRows * 3 * sizeof(int));
    float* wgt = malloc1d((size_t)nRows * 3 * sizeof(float));
    for (r = 0; r < nRows; r++) {
        for (k = 0; k < 3; k++) { idx[r*3+k] = 0; wgt[r*3+k] = 0.0f; }
        for (c = 0; c < nCols; c++) {
            float v = tab[(size_t)r * nCols + c];
            if (v == 0.0f) continue;
            /* insert into the row's top-3 by |v| */
            for (k = 0; k < 3; k++) {
                if (fabsf(v) > fabsf(wgt[r*3+k])) {
                    int kk;
                    for (kk = 2; kk > k; kk--) {
                        wgt[r*3+kk] = wgt[r*3+kk-1];
                        idx[r*3+kk] = idx[r*3+kk-1];
                    }
                    wgt[r*3+k] = v; idx[r*3+k] = c;
                    break;
                }
            }
        }
    }
    char sh[32];
    snprintf(sh, sizeof(sh), "%d,3", nRows);
    dump(tag_idx, idx, (size_t)nRows * 3, "i4", sh);
    dump(tag_w, wgt, (size_t)nRows * 3, "f4", sh);
    free(idx); free(wgt);
}

static unsigned int lcg_state = 424242u;
static float lcg_noise(void)
{
    lcg_state = lcg_state * 1664525u + 1013904223u;
    return (float)(lcg_state >> 8) / 8388608.0f - 1.0f;
}

/* -------------------------------------------------------------------- */
static void golden_binauraliser_rotation(void)
{
    const int fs = 48000, nSrc = 2, nFrames = 48;
    int i, ch, frame;
    void* h;
    binauraliser_create(&h);
    binauraliser_init(h, fs);
    binauraliser_setNumSources(h, nSrc);
    binauraliser_setSourceAzi_deg(h, 0, 30.0f);
    binauraliser_setSourceElev_deg(h, 0, 0.0f);
    binauraliser_setSourceAzi_deg(h, 1, -45.0f);
    binauraliser_setSourceElev_deg(h, 1, 10.0f);
    binauraliser_setEnableRotation(h, 1);
    binauraliser_setYaw(h, 40.0f);
    binauraliser_setPitch(h, -15.0f);
    binauraliser_setRoll(h, 10.0f);
    binauraliser_initCodec(h);

    const int framesize = binauraliser_getFrameSize();
    const int sigLen = nFrames * framesize;
    float** inSig = (float**)malloc2d(nSrc, sigLen, sizeof(float));
    for (ch = 0; ch < nSrc; ch++)
        for (i = 0; i < sigLen; i++)
            inSig[ch][i] = lcg_noise();

    float** binSig = (float**)calloc2d(NUM_EARS, sigLen, sizeof(float));
    float** inFr = (float**)malloc1d(nSrc * sizeof(float*));
    float** outFr = (float**)malloc1d(NUM_EARS * sizeof(float*));
    for (frame = 0; frame < nFrames; frame++) {
        for (ch = 0; ch < nSrc; ch++)
            inFr[ch] = &inSig[ch][frame * framesize];
        for (ch = 0; ch < NUM_EARS; ch++)
            outFr[ch] = &binSig[ch][frame * framesize];
        binauraliser_process(h, (const float* const*)inFr, outFr, nSrc,
                             NUM_EARS, framesize);
    }
    char shape[64];
    snprintf(shape, sizeof(shape), "%d,%d", nSrc, sigLen);
    dump("brot_in", FLATTEN2D(inSig), (size_t)nSrc * sigLen, "f4", shape);
    snprintf(shape, sizeof(shape), "%d,%d", NUM_EARS, sigLen);
    dump("brot_out", FLATTEN2D(binSig), (size_t)NUM_EARS * sigLen, "f4",
         shape);
    binauraliser_destroy(&h);
    free(inSig); free(binSig); free(inFr); free(outFr);
}

/* -------------------------------------------------------------------- */
static void make_sh_input(float** in, int nsh, int sigLen, int order)
{
    /* two planted broadband sources + small sensor noise (part-7 recipe) */
    const float dirs[2][2] = {{45.0f, 20.0f}, {-120.0f, -15.0f}};
    float* Y = malloc1d(nsh * 2 * sizeof(float));
    getRSH(order, (float*)dirs, 2, Y);
    int i, f;
    for (f = 0; f < sigLen; f++) {
        float s0 = lcg_noise(), s1 = 0.7f * lcg_noise();
        for (i = 0; i < nsh; i++)
            in[i][f] = Y[i * 2] * s0 + Y[i * 2 + 1] * s1
                + 0.005f * lcg_noise();
    }
    free(Y);
}

static void golden_powermap_mode(int mode, const char* tag_in,
                                 const char* tag_pmap)
{
    const int order = 3, nsh = 16, frame = 1024, nFrames = 8;
    int f;
    void* h;
    powermap_create(&h);
    powermap_init(h, 48000);
    powermap_setMasterOrder(h, order);
    powermap_setPowermapMode(h, mode);
    powermap_setNumSources(h, 2);
    powermap_setNormType(h, NORM_N3D);
    powermap_setCovAvgCoeff(h, 0.5f);
    powermap_setPowermapAvgCoeff(h, 0.666f);
    powermap_initCodec(h);

    float** in = (float**)malloc2d(nsh, frame, sizeof(float));
    float* in_all = malloc1d((size_t)nFrames * nsh * frame * sizeof(float));
    for (f = 0; f < nFrames; f++) {
        make_sh_input(in, nsh, frame, order);
        memcpy(&in_all[(size_t)f * nsh * frame], FLATTEN2D(in),
               (size_t)nsh * frame * sizeof(float));
        /* re-arm the recalc flag so the display map follows EVERY block
         * (it is otherwise consumed once at create; powermap.c:270-272) */
        powermap_requestPmapUpdate(h);
        powermap_analysis(h, (const float* const*)in, nsh, frame, 1);
    }
    dump(tag_in, in_all, (size_t)nFrames * nsh * frame, "f4", "8,16,1024");
    free(in_all);
    float* grid_dirs, *pmap;
    int nDirs, pmapWidth, hfov, aspect;
    powermap_getPmap(h, &grid_dirs, &pmap, &nDirs, &pmapWidth, &hfov,
                     &aspect);
    char sh[32];
    snprintf(sh, sizeof(sh), "%d", nDirs);
    dump(tag_pmap, pmap, nDirs, "f4", sh);
    {   /* this handle's own display interpolation table (its convhull
         * triangulation jitter depends on the process rand() position,
         * so each handle dumps its own) */
        powermap_codecPars* pars = ((powermap_data*)h)->pars;
        char ti[32], tw[32];
        snprintf(ti, sizeof(ti), "%s_iti", tag_pmap);
        snprintf(tw, sizeof(tw), "%s_itw", tag_pmap);
        dump_itab_sparse(ti, tw, pars->interp_table, pars->interp_nDirs,
                         pars->grid_nDirs);
    }
    powermap_destroy(&h);
    free(in);
}

/* -------------------------------------------------------------------- */
static void golden_ambi_bin_methods(void)
{
    const int order = 3, nsh = 16, nFrames = 64;
    int i, ch, frame;
    const int framesize = ambi_bin_getFrameSize();
    const int sigLen = nFrames * framesize;

    /* shared SH-domain input */
    float** inSig = (float**)malloc2d(nsh, sigLen, sizeof(float));
    for (ch = 0; ch < nsh; ch++)
        for (i = 0; i < sigLen; i++)
            inSig[ch][i] = lcg_noise();
    char shape[64];
    snprintf(shape, sizeof(shape), "%d,%d", nsh, sigLen);
    dump("abls_in", FLATTEN2D(inSig), (size_t)nsh * sigLen, "f4", shape);

    float** binSig = (float**)calloc2d(NUM_EARS, sigLen, sizeof(float));
    float** inFr = (float**)malloc1d(nsh * sizeof(float*));
    float** outFr = (float**)malloc1d(NUM_EARS * sizeof(float*));

    /* 1) LS decoder (truncation EQ active, ambi_bin.c:310-364) + a general
     * rotation so the baked M_dec@M_rot ordering is pinned too */
    void* h;
    ambi_bin_create(&h);
    ambi_bin_init(h, 48000);
    ambi_bin_setInputOrderPreset(h, (SH_ORDERS)order);
    ambi_bin_setNormType(h, NORM_N3D);
    ambi_bin_setDecodingMethod(h, DECODING_METHOD_LS);
    ambi_bin_setEnableRotation(h, 1);
    ambi_bin_setYaw(h, 25.0f);
    ambi_bin_setPitch(h, -10.0f);
    ambi_bin_setRoll(h, 35.0f);
    ambi_bin_initCodec(h);
    for (frame = 0; frame < nFrames; frame++) {
        for (ch = 0; ch < nsh; ch++)
            inFr[ch] = &inSig[ch][frame * framesize];
        for (ch = 0; ch < NUM_EARS; ch++)
            outFr[ch] = &binSig[ch][frame * framesize];
        ambi_bin_process(h, (const float* const*)inFr, outFr, nsh,
                         NUM_EARS, framesize);
    }
    snprintf(shape, sizeof(shape), "%d,%d", NUM_EARS, sigLen);
    dump("abls_out", FLATTEN2D(binSig), (size_t)NUM_EARS * sigLen, "f4",
         shape);
    ambi_bin_destroy(&h);

    /* 2) TA (time-alignment) decoder, no rotation */
    ambi_bin_create(&h);
    ambi_bin_init(h, 48000);
    ambi_bin_setInputOrderPreset(h, (SH_ORDERS)order);
    ambi_bin_setNormType(h, NORM_N3D);
    ambi_bin_setDecodingMethod(h, DECODING_METHOD_TA);
    ambi_bin_setEnableRotation(h, 0);
    ambi_bin_initCodec(h);
    memset(FLATTEN2D(binSig), 0, (size_t)NUM_EARS * sigLen * sizeof(float));
    for (frame = 0; frame < nFrames; frame++) {
        for (ch = 0; ch < nsh; ch++)
            inFr[ch] = &inSig[ch][frame * framesize];
        for (ch = 0; ch < NUM_EARS; ch++)
            outFr[ch] = &binSig[ch][frame * framesize];
        ambi_bin_process(h, (const float* const*)inFr, outFr, nsh,
                         NUM_EARS, framesize);
    }
    dump("abta_out", FLATTEN2D(binSig), (size_t)NUM_EARS * sigLen, "f4",
         shape);
    ambi_bin_destroy(&h);
    free(inSig); free(binSig); free(inFr); free(outFr);
}

/* -------------------------------------------------------------------- */
static void golden_dirass_mode(int mode, const char* tag_in,
                               const char* tag_pmap)
{
    const int order = 2, nsh = 9, nFrames = 6;
    const int frame = dirass_getFrameSize();
    int i, f, t;
    void* h;
    dirass_create(&h);
    dirass_init(h, 48000);
    dirass_setInputOrder(h, order);
    dirass_setNormType(h, NORM_N3D);
    dirass_setBeamType(h, STATIC_BEAM_TYPE_MAX_EV);
    dirass_setDisplayGridOption(h, T_DESIGN_18);
    dirass_setUpscaleOrder(h, 6);
    dirass_setDiRAssMode(h, mode);
    dirass_setMinFreq(h, 100.0f);
    dirass_setMaxFreq(h, 8000.0f);
    dirass_setMapAvgCoeff(h, 0.25f);
    dirass_initCodec(h);

    const float sdirs[2][2] = {{45.0f, 20.0f}, {-120.0f, -15.0f}};
    float* Y = malloc1d(nsh * 2 * sizeof(float));
    getRSH(order, (float*)sdirs, 2, Y);
    float** in = (float**)malloc2d(nsh, frame, sizeof(float));
    float* in_all = malloc1d((size_t)nFrames * nsh * frame * sizeof(float));
    for (f = 0; f < nFrames; f++) {
        for (t = 0; t < frame; t++) {
            float s0 = lcg_noise(), s1 = 0.7f * lcg_noise();
            for (i = 0; i < nsh; i++)
                in[i][t] = Y[i * 2] * s0 + Y[i * 2 + 1] * s1
                    + 0.005f * lcg_noise();
        }
        memcpy(&in_all[(size_t)f * nsh * frame], FLATTEN2D(in),
               (size_t)nsh * frame * sizeof(float));
        dirass_requestPmapUpdate(h);  /* as in golden_powermap_mode */
        dirass_analysis(h, (const float* const*)in, nsh, frame, 1);
    }
    free(Y);
    float* grid_dirs, *pmap;
    int nDirs, pmapWidth, hfov;
    float aspect;
    dirass_getPmap(h, &grid_dirs, &pmap, &nDirs, &pmapWidth, &hfov, &aspect);
    char sh[32];
    snprintf(sh, sizeof(sh), "%d,%d,%d", nFrames, nsh, frame);
    dump(tag_in, in_all, (size_t)nFrames * nsh * frame, "f4", sh);
    snprintf(sh, sizeof(sh), "%d", nDirs);
    dump(tag_pmap, pmap, nDirs, "f4", sh);
    {
        dirass_codecPars* pars = ((dirass_data*)h)->pars;
        char ti[32], tw[32];
        snprintf(ti, sizeof(ti), "%s_iti", tag_pmap);
        snprintf(tw, sizeof(tw), "%s_itw", tag_pmap);
        dump_itab_sparse(ti, tw, pars->interp_table, pars->interp_nDirs,
                         pars->grid_nDirs);
    }
    dirass_destroy(&h);
    free(in); free(in_all);
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

    golden_binauraliser_rotation();
    printf("binauraliser(rotation) goldens done\n");
    golden_powermap_mode(PM_MODE_PWD, "pmp_in", "pmp_pmap");
    printf("powermap(PWD) goldens done\n");
    golden_powermap_mode(PM_MODE_MVDR, "pmv_in", "pmv_pmap");
    printf("powermap(MVDR) goldens done\n");
    golden_ambi_bin_methods();
    printf("ambi_bin(LS/TA) goldens done\n");
    golden_dirass_mode(REASS_NEAREST, "dirn_in", "dirn_pmap");
    printf("dirass(NEAREST) goldens done\n");
    golden_dirass_mode(REASS_MODE_OFF, "diro_in", "diro_pmap");
    printf("dirass(OFF) goldens done\n");
    golden_dirass_mode(REASS_UPSCALE, "diru_in", "diru_pmap");
    printf("dirass(UPSCALE) goldens done\n");

    fclose(manifest);
    return 0;
}
