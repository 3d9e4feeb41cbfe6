/* Golden-fixture generator, part 5: HADES end-to-end (analysis + binaural
 * synthesis).  Mirrors the reference's own test recipe (test__hades_module.c)
 * but with a deterministic simulated 6-mic array (36-dir t-design grid,
 * LCG-random 32-tap IRs, dumped for the Python side) instead of the missing
 * SOFA measurement file, and a structured input (mono LCG noise rendered
 * through the IRs of grid direction 17 + a -40 dB uncorrelated noise floor)
 * so the DoA estimate is well defined in every band.
 *
 * Config: afSTFT low-delay, hop 64, blocksize 256, no hybrid mode;
 * COMEDIE + sdMUSIC analysis; BMVDR beamforming w/ covariance matching;
 * NEAREST HRTF interpolation; reference sensors {1, 5}; default HRIRs
 * (the synthesised set injected into this build).
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

#include "saf.h"
#include "saf_hades_analysis.h"
#include "saf_hades_synthesis.h"
#include "saf_hades_internal.h"

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

static unsigned int lcg_state = 424242u;
static float lcg_noise(void)
{
    lcg_state = lcg_state * 1664525u + 1013904223u;
    return (float)(lcg_state >> 8) / 8388608.0f - 1.0f;
}

int main(int argc, char** argv)
{
    if (argc != 2) { fprintf(stderr, "usage: %s <outdir>\n", argv[0]); return 1; }
    outdir = argv[1];
    char mpath[512];
    snprintf(mpath, sizeof(mpath), "%s/manifest.txt", outdir);
    manifest = fopen(mpath, "a");
    if (!manifest) { perror(mpath); return 1; }

    const int fs = 48000, hopsize = 64, blocksize = 256, hybridmode = 0;
    const int nGrid = 36, nMics = 6, h_len = 32, nBlocks = 16;
    const int sigLen = blocksize * nBlocks;
    const int SRC_IDX = 17;
    int i, j, t, ch, blk;

    /* deterministic array IRs + grid */
    float* grid_dirs_deg = (float*)__Tdesign_degree_8_dirs_deg;  /* 36 x 2 */
    float* h_array = malloc1d(nGrid * nMics * h_len * sizeof(float));
    for (i = 0; i < nGrid * nMics; i++)
        for (t = 0; t < h_len; t++)
            h_array[i * h_len + t] =
                lcg_noise() * expf(-(float)t / 10.0f);
    dump("hds_h_array", h_array, (size_t)nGrid * nMics * h_len, "f4",
         "36,6,32");
    dump("hds_grid_dirs_deg", grid_dirs_deg, nGrid * 2, "f4", "36,2");

    /* analysis */
    hades_analysis_handle hAna = NULL;
    hades_analysis_create(&hAna, (float)fs, HADES_USE_AFSTFT_LD, hopsize,
                          blocksize, hybridmode, h_array, grid_dirs_deg,
                          nGrid, nMics, h_len, HADES_USE_COMEDIE,
                          HADES_USE_MUSIC);
    hades_analysis_data* a = (hades_analysis_data*)hAna;
    const int nBands = a->nBands;
    {
        char sh[32];
        snprintf(sh, sizeof(sh), "%d", nBands);
        dump("hds_freq_vector", a->freqVector, nBands, "f4", sh);
        snprintf(sh, sizeof(sh), "%d,%d,%d", nBands, nMics, nGrid);
        dump("hds_H_array_fb", a->H_array, (size_t)nBands * nMics * nGrid,
             "c8", sh);
        dump("hds_H_array_w", a->H_array_w, (size_t)nBands * nMics * nGrid,
             "c8", sh);
        snprintf(sh, sizeof(sh), "%d,%d,%d", nBands, nMics, nMics);
        dump("hds_DCM", a->DCM_array, (size_t)nBands * nMics * nMics, "c8",
             sh);
        float cov[1] = {a->covAvgCoeff};
        dump("hds_cov_avg", cov, 1, "f4", "1");
    }

    /* containers + synthesis */
    hades_param_container_handle hPCon = NULL;
    hades_signal_container_handle hSCon = NULL;
    hades_param_container_create(&hPCon, hAna);
    hades_signal_container_create(&hSCon, hAna);

    hades_binaural_config binConfig;
    binConfig.hrir_fs = __default_hrir_fs;
    binConfig.lHRIR = __default_hrir_len;
    binConfig.nHRIR = __default_N_hrir_dirs;
    binConfig.hrirs = (float*)__default_hrirs;
    binConfig.hrir_dirs_deg = (float*)__default_hrir_dirs_deg;
    int refIndices[2] = {1, 5};
    hades_synthesis_handle hSyn = NULL;
    hades_synthesis_create(&hSyn, hAna, HADES_BEAMFORMER_BMVDR, 1,
                           refIndices, &binConfig, HADES_HRTF_INTERP_NEAREST);
    hades_synthesis_data* s = (hades_synthesis_data*)hSyn;
    {
        char sh[32];
        snprintf(sh, sizeof(sh), "%d,2,%d", nBands, nGrid);
        dump("hds_H_bin", s->H_bin, (size_t)nBands * 2 * nGrid, "c8", sh);
        snprintf(sh, sizeof(sh), "%d", nBands);
        dump("hds_diff_eq", s->diffEQ, nBands, "f4", sh);
        float sa[1] = {s->synAvgCoeff};
        dump("hds_syn_avg", sa, 1, "f4", "1");
    }

    /* input: mono noise through the IRs of grid dir SRC_IDX + noise floor */
    float* mono = malloc1d(sigLen * sizeof(float));
    for (t = 0; t < sigLen; t++)
        mono[t] = lcg_noise();
    float** inSig = (float**)calloc2d(nMics, sigLen, sizeof(float));
    for (ch = 0; ch < nMics; ch++) {
        const float* h = &h_array[(SRC_IDX * nMics + ch) * h_len];
        for (t = 0; t < sigLen; t++) {
            float acc = 0.0f;
            for (j = 0; j < h_len && j <= t; j++)
                acc += h[j] * mono[t - j];
            inSig[ch][t] = acc + 0.01f * lcg_noise();
        }
    }
    dump("hds_in", FLATTEN2D(inSig), (size_t)nMics * sigLen, "f4",
         "6,4096");

    /* main loop */
    hades_param_container_data* pcon = (hades_param_container_data*)hPCon;
    float** inBlk = (float**)malloc2d(nMics, blocksize, sizeof(float));
    float** outBlk = (float**)malloc2d(2, blocksize, sizeof(float));
    float* diff_all = malloc1d(nBlocks * nBands * sizeof(float));
    float* doa_all = malloc1d(nBlocks * nBands * sizeof(float));
    float* out_all = malloc1d(2 * sigLen * sizeof(float));
    for (blk = 0; blk < nBlocks; blk++) {
        for (ch = 0; ch < nMics; ch++)
            memcpy(inBlk[ch], &inSig[ch][blk * blocksize],
                   blocksize * sizeof(float));
        hades_analysis_apply(hAna, inBlk, nMics, blocksize, hPCon, hSCon);
        memcpy(&diff_all[blk * nBands], pcon->diffuseness,
               nBands * sizeof(float));
        for (i = 0; i < nBands; i++)
            doa_all[blk * nBands + i] = (float)pcon->doa_idx[i];
        hades_synthesis_apply(hSyn, hPCon, hSCon, 2, blocksize, outBlk);
        for (ch = 0; ch < 2; ch++)
            memcpy(&out_all[ch * sigLen + blk * blocksize], outBlk[ch],
                   blocksize * sizeof(float));
    }
    {
        char sh[32];
        snprintf(sh, sizeof(sh), "%d,%d", nBlocks, nBands);
        dump("hds_diffuseness", diff_all, (size_t)nBlocks * nBands, "f4", sh);
        dump("hds_doa_idx", doa_all, (size_t)nBlocks * nBands, "f4", sh);
        snprintf(sh, sizeof(sh), "2,%d", sigLen);
        dump("hds_out_bin", out_all, (size_t)2 * sigLen, "f4", sh);
    }
    printf("hades goldens done (nBands=%d)\n", nBands);

    hades_analysis_destroy(&hAna);
    hades_param_container_destroy(&hPCon);
    hades_signal_container_destroy(&hSCon);
    hades_synthesis_destroy(&hSyn);
    fclose(manifest);
    return 0;
}
