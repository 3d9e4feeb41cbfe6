/* Golden-fixture generator, part 13: the remaining unpinned option
 * branches —
 *  - binauraliser_nf with head ROTATION engaged (binauraliser_nf.c:267-284
 *    uses the same row-convention src_row @ Rzyx as the binauraliser; the
 *    part-9 pin ran rotation-off),
 *  - powermap in MINNORM, MUSIC_LOG and CroPaC-LCMV modes,
 *  - ambi_bin with the LSDIFFEQ and SPR decoders,
 *  - beamformer with cardioid and hypercardioid patterns (part 8 pinned
 *    only MAX_EV).
 *
 * binauraliser_nf runs FIRST so its initCodec triangulation jitter starts
 * at glibc-rand offset 0 (as in part 9).
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

#include "saf.h"
#include "binauraliser_nf.h"
#include "powermap.h"
#include "powermap_internal.h"
#include "ambi_bin.h"
#include "beamformer.h"

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

static unsigned int lcg_state = 131313u;
static float lcg_noise(void)
{
    lcg_state = lcg_state * 1664525u + 1013904223u;
    return (float)(lcg_state >> 8) / 8388608.0f - 1.0f;
}

/* -------------------------------------------------------------------- */
static void golden_binauraliser_nf_rotation(void)
{
    const int nSrc = 2, nFrames = 48;
    const int frame = binauraliser_getFrameSize();
    const float sdirs[2][2] = {{35.0f, 12.0f}, {-60.0f, -8.0f}};
    const float dists[2] = {0.35f, 0.8f};
    int i, f, ch;
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
    binauraliser_setEnableRotation(h, 1);
    binauraliser_setYaw(h, 40.0f);
    binauraliser_setPitch(h, -15.0f);
    binauraliser_setRoll(h, 10.0f);
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
        for (ch = 0; ch < nSrc; ch++)
            memcpy(inF[ch], &in[ch][f * frame], frame * sizeof(float));
        binauraliserNF_process(h, (const float* const*)inF, outF, nSrc, 2,
                               frame);
        for (ch = 0; ch < 2; ch++)
            memcpy(&out[(size_t)ch * nFrames * frame + f * frame], outF[ch],
                   frame * sizeof(float));
    }
    char sh[32];
    snprintf(sh, sizeof(sh), "%d,%d", nSrc, nFrames * frame);
    dump("bnfr_in", FLATTEN2D(in), (size_t)nSrc * nFrames * frame, "f4", sh);
    snprintf(sh, sizeof(sh), "2,%d", nFrames * frame);
    dump("bnfr_out", out, (size_t)2 * nFrames * frame, "f4", sh);
    binauraliserNF_destroy(&h);
    free(in); free(inF); free(outF); free(out);
}

/* -------------------------------------------------------------------- */
static void make_sh_input(float** in, int nsh, int sigLen, int order)
{
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
    {
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
static void golden_ambi_bin_methods2(void)
{
    const int order = 3, nsh = 16, nFrames = 64;
    int i, ch, frame;
    const int framesize = ambi_bin_getFrameSize();
    const int sigLen = nFrames * framesize;

    float** inSig = (float**)malloc2d(nsh, sigLen, sizeof(float));
    for (ch = 0; ch < nsh; ch++)
        for (i = 0; i < sigLen; i++)
            inSig[ch][i] = lcg_noise();
    char shape[64];
    snprintf(shape, sizeof(shape), "%d,%d", nsh, sigLen);
    dump("ab2_in", FLATTEN2D(inSig), (size_t)nsh * sigLen, "f4", shape);

    float** binSig = (float**)calloc2d(NUM_EARS, sigLen, sizeof(float));
    float** inFr = (float**)malloc1d(nsh * sizeof(float*));
    float** outFr = (float**)malloc1d(NUM_EARS * sizeof(float*));
    const int methods[2] = {DECODING_METHOD_LSDIFFEQ, DECODING_METHOD_SPR};
    const char* tags[2] = {"ablsd_out", "abspr_out"};
    int m;
    for (m = 0; m < 2; m++) {
        void* h;
        ambi_bin_create(&h);
        ambi_bin_init(h, 48000);
        ambi_bin_setInputOrderPreset(h, (SH_ORDERS)order);
        ambi_bin_setNormType(h, NORM_N3D);
        ambi_bin_setDecodingMethod(h, methods[m]);
        ambi_bin_setEnableRotation(h, 0);
        ambi_bin_initCodec(h);
        memset(FLATTEN2D(binSig), 0,
               (size_t)NUM_EARS * sigLen * sizeof(float));
        for (frame = 0; frame < nFrames; frame++) {
            for (ch = 0; ch < nsh; ch++)
                inFr[ch] = &inSig[ch][frame * framesize];
            for (ch = 0; ch < NUM_EARS; ch++)
                outFr[ch] = &binSig[ch][frame * framesize];
            ambi_bin_process(h, (const float* const*)inFr, outFr, nsh,
                             NUM_EARS, framesize);
        }
        snprintf(shape, sizeof(shape), "%d,%d", NUM_EARS, sigLen);
        dump(tags[m], FLATTEN2D(binSig), (size_t)NUM_EARS * sigLen, "f4",
             shape);
        ambi_bin_destroy(&h);
    }
    free(inSig); free(binSig); free(inFr); free(outFr);
}

/* -------------------------------------------------------------------- */
static void golden_beamformer_types(void)
{
    const int order = 3, nsh = 16, nBeams = 2, nFrames = 32;
    const int frame = beamformer_getFrameSize();
    const float bdirs[2][2] = {{20.0f, 15.0f}, {-110.0f, -10.0f}};
    int i, f, ch;
    const int types[2] = {STATIC_BEAM_TYPE_CARDIOID,
                          STATIC_BEAM_TYPE_HYPERCARDIOID};
    const char* tags[2] = {"bfc_out", "bfh_out"};

    float** in = (float**)malloc2d(nsh, nFrames * frame, sizeof(float));
    for (i = 0; i < nsh; i++)
        for (f = 0; f < nFrames * frame; f++)
            in[i][f] = lcg_noise();
    char sh[32];
    snprintf(sh, sizeof(sh), "%d,%d", nsh, nFrames * frame);
    dump("bf2_in", FLATTEN2D(in), (size_t)nsh * nFrames * frame, "f4", sh);

    float** inF = (float**)malloc2d(nsh, frame, sizeof(float));
    float** outF = (float**)malloc2d(nBeams, frame, sizeof(float));
    float* out = malloc1d((size_t)nBeams * nFrames * frame * sizeof(float));
    int t;
    for (t = 0; t < 2; t++) {
        void* h;
        beamformer_create(&h);
        beamformer_init(h, 48000);
        beamformer_setBeamOrder(h, order);
        beamformer_setNormType(h, NORM_N3D);
        beamformer_setNumBeams(h, nBeams);
        for (i = 0; i < nBeams; i++) {
            beamformer_setBeamAzi_deg(h, i, bdirs[i][0]);
            beamformer_setBeamElev_deg(h, i, bdirs[i][1]);
        }
        beamformer_setBeamType(h, types[t]);
        for (f = 0; f < nFrames; f++) {
            for (ch = 0; ch < nsh; ch++)
                memcpy(inF[ch], &in[ch][f * frame], frame * sizeof(float));
            beamformer_process(h, (const float* const*)inF, outF, nsh,
                               nBeams, frame);
            for (ch = 0; ch < nBeams; ch++)
                memcpy(&out[(size_t)ch * nFrames * frame + f * frame],
                       outF[ch], frame * sizeof(float));
        }
        snprintf(sh, sizeof(sh), "%d,%d", nBeams, nFrames * frame);
        dump(tags[t], out, (size_t)nBeams * nFrames * frame, "f4", sh);
        beamformer_destroy(&h);
    }
    free(in); free(inF); free(outF); free(out);
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

    golden_binauraliser_nf_rotation();
    printf("binauraliser_nf(rotation) goldens done\n");
    golden_powermap_mode(PM_MODE_MINNORM, "pmn_in", "pmn_pmap");
    printf("powermap(MINNORM) goldens done\n");
    golden_powermap_mode(PM_MODE_MUSIC_LOG, "pml_in", "pml_pmap");
    printf("powermap(MUSIC_LOG) goldens done\n");
    golden_powermap_mode(PM_MODE_CROPAC_LCMV, "pmc_in", "pmc_pmap");
    printf("powermap(CroPaC) goldens done\n");
    golden_ambi_bin_methods2();
    printf("ambi_bin(LSDIFFEQ/SPR) goldens done\n");
    golden_beamformer_types();
    printf("beamformer(cardioid/hypercardioid) goldens done\n");

    fclose(manifest);
    return 0;
}
