/* Self-distance probe for the reference HADES pipeline (NOT a golden
 * generator): runs gen_goldens5.c's exact BMVDR+CM configuration twice,
 * with the second input perturbed by ONE ULP per sample, and prints the
 * max |out_a - out_b| over the 16 blocks.
 *
 * Motivation (round-4): our rebuilt pipeline pins the C's hds_out_bin at
 * 2.9e-4 abs.  formulate_M_and_Cr_cmplx consumes the near-rank-1 per-band
 * SCM, whose f32 cgesvd is chaotic in the near-degenerate subspace — this
 * probe measures the C's OWN output sensitivity at the same scale, i.e.
 * the tightest parity any independent f32 implementation can achieve. */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "saf.h"

static unsigned int lcg_state = 424242u;
static float lcg_noise(void)
{
    lcg_state = lcg_state * 1664525u + 1013904223u;
    return (float)(lcg_state >> 8) / 8388608.0f - 1.0f;
}

static void run_once(const float* const* inSig, float* out_all, int perturb)
{
    const int fs = 48000, hopsize = 64, blocksize = 256, hybridmode = 0;
    const int nGrid = 36, nMics = 6, h_len = 32, nBlocks = 16;
    const int sigLen = blocksize * nBlocks;
    int i, t, ch, blk;

    lcg_state = 424242u;
    float* grid_dirs_deg = (float*)__Tdesign_degree_8_dirs_deg;
    float* h_array = malloc1d(nGrid * nMics * h_len * sizeof(float));
    for (i = 0; i < nGrid * nMics; i++)
        for (t = 0; t < h_len; t++)
            h_array[i * h_len + t] = lcg_noise() * expf(-(float)t / 10.0f);

    hades_analysis_handle hAna = NULL;
    hades_analysis_create(&hAna, (float)fs, HADES_USE_AFSTFT_LD, hopsize,
                          blocksize, hybridmode, h_array, grid_dirs_deg,
                          nGrid, nMics, h_len, HADES_USE_COMEDIE,
                          HADES_USE_MUSIC);
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

    float** inBlk = (float**)malloc2d(nMics, blocksize, sizeof(float));
    float** outBlk = (float**)malloc2d(2, blocksize, sizeof(float));
    for (blk = 0; blk < nBlocks; blk++) {
        for (ch = 0; ch < nMics; ch++) {
            memcpy(inBlk[ch], &inSig[ch][blk * blocksize],
                   blocksize * sizeof(float));
            if (perturb)
                for (t = 0; t < blocksize; t++)
                    inBlk[ch][t] = nextafterf(inBlk[ch][t], 2.0f);
        }
        hades_analysis_apply(hAna, (float**)inBlk, nMics, blocksize,
                             hPCon, hSCon);
        hades_synthesis_apply(hSyn, hPCon, hSCon, 2, blocksize, outBlk);
        for (ch = 0; ch < 2; ch++)
            memcpy(&out_all[ch * sigLen + blk * blocksize], outBlk[ch],
                   blocksize * sizeof(float));
    }
    hades_analysis_destroy(&hAna);
    hades_synthesis_destroy(&hSyn);
    hades_param_container_destroy(&hPCon);
    hades_signal_container_destroy(&hSCon);
    free(h_array); free(inBlk); free(outBlk);
}

int main(void)
{
    const int nMics = 6, h_len = 32, blocksize = 256, nBlocks = 16;
    const int sigLen = blocksize * nBlocks, SRC_IDX = 17, nGrid = 36;
    int t, ch, j, i;

    /* regenerate the exact gen_goldens5 input */
    lcg_state = 424242u;
    float* h_array = malloc1d(nGrid * nMics * h_len * sizeof(float));
    for (i = 0; i < nGrid * nMics; i++)
        for (t = 0; t < h_len; t++)
            h_array[i * h_len + t] = lcg_noise() * expf(-(float)t / 10.0f);
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

    float* out_a = malloc1d(2 * sigLen * sizeof(float));
    float* out_b = malloc1d(2 * sigLen * sizeof(float));
    run_once((const float* const*)inSig, out_a, 0);
    run_once((const float* const*)inSig, out_b, 1);
    float dmax = 0.0f, omax = 0.0f;
    for (t = 0; t < 2 * sigLen; t++) {
        float d = fabsf(out_a[t] - out_b[t]);
        if (d > dmax) dmax = d;
        if (fabsf(out_a[t]) > omax) omax = fabsf(out_a[t]);
    }
    printf("C self-distance under 1-ulp input perturbation: "
           "max|dOut| = %g   (|out|max = %g, rel = %g)\n",
           dmax, omax, dmax / omax);
    return 0;
}
