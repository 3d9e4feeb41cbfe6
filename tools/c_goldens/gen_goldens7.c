/* Golden-fixture generator, part 7: example-level coverage for array2sh
 * (the four regularised encoder filter designs), panner (frequency-dependent
 * p-value VBAP), the powermap + sldoa analysers driven end-to-end through
 * the compiled examples, and the spreader in all three modes.
 *
 * All examples follow the reference lifecycle: create → init(fs) → setters →
 * initCodec (or first process() for array2sh) → process frames → getters.
 * Inputs are deterministic LCG noise / planted SH-domain sources.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

#include "saf.h"
#include "array2sh.h"
#include "panner.h"
#include "powermap.h"
#include "sldoa.h"
#include "spreader.h"
/* internal: to read the computed encoding matrices */
#include "array2sh_internal.h"

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

static unsigned int lcg_state = 13579u;
static float lcg_noise(void)
{
    lcg_state = lcg_state * 1664525u + 1013904223u;
    return (float)(lcg_state >> 8) / 8388608.0f - 1.0f;
}

/* -------------------------------------------------------------------- */
static void golden_array2sh(void)
{
    /* Eigenmike32, order 4, N3D: the four filter designs */
    const int order = 4, nsh = 25, Q = 32, nbands = 133, frame = 128;
    const int ftypes[4] = {FILTER_SOFT_LIM, FILTER_TIKHONOV, FILTER_Z_STYLE,
                           FILTER_Z_STYLE_MAXRE};
    const char* fnames[4] = {"softlim", "tikhonov", "zstyle", "zstylemaxre"};
    int ft, b, s, q, i;
    float** inF = (float**)malloc2d(Q, frame, sizeof(float));
    float** outF = (float**)malloc2d(nsh, frame, sizeof(float));
    float_complex* Wslice = malloc1d((size_t)nbands * nsh * Q
                                     * sizeof(float_complex));
    for (i = 0; i < Q; i++)
        for (b = 0; b < frame; b++)
            inF[i][b] = lcg_noise();

    for (ft = 0; ft < 4; ft++) {
        void* h;
        array2sh_create(&h);
        array2sh_init(h, 48000);
        array2sh_setPreset(h, MICROPHONE_ARRAY_PRESET_EIGENMIKE32);
        array2sh_setEncodingOrder(h, order);
        array2sh_setNormType(h, NORM_N3D);
        array2sh_setFilterType(h, ftypes[ft]);
        /* matrices are computed inside process() on the reinit flag */
        array2sh_process(h, (const float* const*)inF, outF, Q, nsh, frame);
        array2sh_data* pData = (array2sh_data*)h;
        for (b = 0; b < nbands; b++)
            for (s = 0; s < nsh; s++)
                for (q = 0; q < Q; q++)
                    Wslice[((size_t)b * nsh + s) * Q + q] = pData->W[b][s][q];
        char key[64], sh[32];
        snprintf(key, sizeof(key), "a2s_W_%s", fnames[ft]);
        snprintf(sh, sizeof(sh), "%d,%d,%d", nbands, nsh, Q);
        dump(key, Wslice, (size_t)nbands * nsh * Q, "c8", sh);
        array2sh_destroy(&h);
    }
    free(inF); free(outF); free(Wslice);
}

/* -------------------------------------------------------------------- */
static void golden_panner(void)
{
    /* 9-speaker generic layout (as the lsdec golden), 2 sources, DTT 0.5 */
    const float ls_dirs[9][2] = {
        {0.0f, -3.0f}, {47.0f, 2.0f}, {-42.0f, 1.0f}, {88.0f, -2.0f},
        {-93.0f, 0.0f}, {132.0f, 3.0f}, {-138.0f, -1.0f},
        {30.0f, 40.0f}, {-60.0f, 28.0f}};
    const float src_dirs[2][2] = {{20.0f, 10.0f}, {-75.0f, -5.0f}};
    const int nLS = 9, nSrc = 2, frame = 128, nFrames = 32;
    const int sigLen = frame * nFrames;
    int i, f;
    void* h;
    panner_create(&h);
    panner_init(h, 48000);
    panner_setNumLoudspeakers(h, nLS);
    for (i = 0; i < nLS; i++) {
        panner_setLoudspeakerAzi_deg(h, i, ls_dirs[i][0]);
        panner_setLoudspeakerElev_deg(h, i, ls_dirs[i][1]);
    }
    panner_setNumSources(h, nSrc);
    for (i = 0; i < nSrc; i++) {
        panner_setSourceAzi_deg(h, i, src_dirs[i][0]);
        panner_setSourceElev_deg(h, i, src_dirs[i][1]);
    }
    panner_setDTT(h, 0.5f);
    panner_setSpread(h, 0.0f);
    panner_initCodec(h);

    float** in = (float**)malloc2d(nSrc, sigLen, sizeof(float));
    for (i = 0; i < nSrc; i++)
        for (f = 0; f < sigLen; f++)
            in[i][f] = lcg_noise();
    float** inF = (float**)malloc2d(nSrc, frame, sizeof(float));
    float** outF = (float**)malloc2d(nLS, frame, sizeof(float));
    float* out = malloc1d((size_t)nLS * sigLen * sizeof(float));
    for (f = 0; f < nFrames; f++) {
        for (i = 0; i < nSrc; i++)
            memcpy(inF[i], &in[i][f * frame], frame * sizeof(float));
        panner_process(h, (const float* const*)inF, outF, nSrc, nLS, frame);
        for (i = 0; i < nLS; i++)
            memcpy(&out[(size_t)i * sigLen + f * frame], outF[i],
                   frame * sizeof(float));
    }
    panner_destroy(&h);
    dump("pan_ls_dirs", ls_dirs, 18, "f4", "9,2");
    dump("pan_src_dirs", src_dirs, 4, "f4", "2,2");
    dump("pan_in", FLATTEN2D(in), (size_t)nSrc * sigLen, "f4", "2,4096");
    dump("pan_out", out, (size_t)nLS * sigLen, "f4", "9,4096");
    free(in); free(inF); free(outF); free(out);
}

/* -------------------------------------------------------------------- */
static void make_sh_input(float** in, int nsh, int sigLen, int order)
{
    /* two planted broadband sources + small sensor noise */
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

static void golden_powermap(void)
{
    const int order = 3, nsh = 16, frame = 1024, nFrames = 8;
    int i, f;
    void* h;
    powermap_create(&h);
    powermap_init(h, 48000);
    powermap_setMasterOrder(h, order);
    powermap_setPowermapMode(h, PM_MODE_MUSIC);
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
        powermap_analysis(h, (const float* const*)in, nsh, frame, 1);
    }
    dump("pm_in", in_all, (size_t)nFrames * nsh * frame, "f4", "8,16,1024");
    free(in_all);
    float* grid_dirs, *pmap;
    int nDirs, pmapWidth, hfov, aspect;
    powermap_getPmap(h, &grid_dirs, &pmap, &nDirs, &pmapWidth, &hfov,
                     &aspect);
    {
        char sh[32];
        snprintf(sh, sizeof(sh), "%d", nDirs);
        dump("pm_pmap", pmap, nDirs, "f4", sh);
        float meta[4] = {(float)nDirs, (float)pmapWidth, (float)hfov,
                         (float)aspect};
        dump("pm_meta", meta, 4, "f4", "4");
        snprintf(sh, sizeof(sh), "%d,2", nDirs);
        dump("pm_grid_dirs", grid_dirs, (size_t)nDirs * 2, "f4", sh);
    }
    powermap_destroy(&h);
    free(in);
}

static void golden_sldoa(void)
{
    const int order = 3, nsh = 16, frame = 1024, nFrames = 8;
    int i, f;
    void* h;
    sldoa_create(&h);
    sldoa_init(h, 48000);
    sldoa_setMasterOrder(h, order);
    sldoa_setAnaOrderAllBands(h, order);
    sldoa_setNormType(h, NORM_N3D);
    sldoa_setMaxFreq(h, 10000.0f);
    sldoa_setMinFreq(h, 500.0f);
    sldoa_setAvg(h, 0.5f);
    sldoa_initCodec(h);

    float** in = (float**)malloc2d(nsh, frame, sizeof(float));
    float* in_all = malloc1d((size_t)nFrames * nsh * frame * sizeof(float));
    for (f = 0; f < nFrames; f++) {
        make_sh_input(in, nsh, frame, order);
        memcpy(&in_all[(size_t)f * nsh * frame], FLATTEN2D(in),
               (size_t)nsh * frame * sizeof(float));
        sldoa_analysis(h, (const float* const*)in, nsh, frame, 1);
    }
    dump("sl_in", in_all, (size_t)nFrames * nsh * frame, "f4", "8,16,1024");
    free(in_all);
    float *azi, *elev, *colour, *alpha;
    int *nSecPerBand, maxNumSectors, startBand, endBand;
    sldoa_getDisplayData(h, &azi, &elev, &colour, &alpha, &nSecPerBand,
                         &maxNumSectors, &startBand, &endBand);
    const int nBands = sldoa_getNumberOfBands();
    {
        char sh[32];
        snprintf(sh, sizeof(sh), "%d,%d", maxNumSectors, nBands);
        dump("sl_azi", azi, (size_t)maxNumSectors * nBands, "f4", sh);
        dump("sl_elev", elev, (size_t)maxNumSectors * nBands, "f4", sh);
        dump("sl_colour", colour, (size_t)maxNumSectors * nBands, "f4", sh);
        dump("sl_alpha", alpha, (size_t)maxNumSectors * nBands, "f4", sh);
        float* nspb = malloc1d(nBands * sizeof(float));
        for (i = 0; i < nBands; i++)
            nspb[i] = (float)nSecPerBand[i];
        snprintf(sh, sizeof(sh), "%d", nBands);
        dump("sl_nsec_per_band", nspb, nBands, "f4", sh);
        float meta[3] = {(float)maxNumSectors, (float)startBand,
                         (float)endBand};
        dump("sl_meta", meta, 3, "f4", "3");
        free(nspb);
    }
    sldoa_destroy(&h);
    free(in);
}

/* -------------------------------------------------------------------- */
static void golden_spreader(void)
{
    /* SPREADER_FRAME_SIZE is 512 (spreader_internal.h:51) */
    const int frame = 512, nFrames = 8, sigLen = frame * nFrames;
    const int modes[3] = {SPREADER_MODE_NAIVE, SPREADER_MODE_OM,
                          SPREADER_MODE_EVD};
    const char* mnames[3] = {"naive", "om", "evd"};
    int m, i, f;
    float* inSig = malloc1d(sigLen * sizeof(float));
    for (f = 0; f < sigLen; f++)
        inSig[f] = lcg_noise();
    dump("spr_in", inSig, sigLen, "f4", "4096");

    for (m = 0; m < 3; m++) {
        void* h;
        spreader_create(&h);
        spreader_init(h, 48000);
        spreader_setUseDefaultHRIRsflag(h, 1);
        spreader_setNumSources(h, 1);
        spreader_setSourceAzi_deg(h, 0, 40.0f);
        spreader_setSourceElev_deg(h, 0, 10.0f);
        spreader_setSourceSpread_deg(h, 0, 60.0f);
        spreader_setSpreadingMode(h, modes[m]);
        spreader_setAveragingCoeff(h, 0.5f);
        spreader_initCodec(h);

        float** inF = (float**)malloc2d(1, frame, sizeof(float));
        float** outF = (float**)malloc2d(2, frame, sizeof(float));
        float* out = malloc1d((size_t)2 * sigLen * sizeof(float));
        for (f = 0; f < nFrames; f++) {
            memcpy(inF[0], &inSig[f * frame], frame * sizeof(float));
            spreader_process(h, (const float* const*)inF, outF, 1, 2, frame);
            for (i = 0; i < 2; i++)
                memcpy(&out[(size_t)i * sigLen + f * frame], outF[i],
                       frame * sizeof(float));
        }
        char key[64];
        snprintf(key, sizeof(key), "spr_out_%s", mnames[m]);
        dump(key, out, (size_t)2 * sigLen, "f4", "2,4096");
        spreader_destroy(&h);
        free(inF); free(outF); free(out);
    }
    free(inSig);
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

    golden_array2sh();
    printf("array2sh goldens done\n");
    golden_panner();
    printf("panner goldens done\n");
    golden_powermap();
    printf("powermap goldens done\n");
    golden_sldoa();
    printf("sldoa goldens done\n");
    golden_spreader();
    printf("spreader goldens done\n");

    fclose(manifest);
    return 0;
}
