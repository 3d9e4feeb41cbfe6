/* Golden-fixture generator, part 15: the remaining HADES option branches +
 * the binauraliser's TRI_PS interpolation mode.
 *
 *  A) hdt_*: HADES with BEAMFORMER_NONE, enableCM=0 and TRIANGULAR HRTF
 *     interpolation.  The HRIR set is synthetic and lives on the SAME
 *     36-dir t-design grid as the analysis grid: the C's triangular path
 *     passes a nTargetDirs-length Voronoi-weight array into
 *     diffuseFieldEqualiseHRTFs over nHRIR HRTFs
 *     (saf_hades_internal.c:93-101), which is only well defined when
 *     nHRIR == nTargetDirs — this config makes the semantics exact on
 *     both sides (see docs/C_PARITY.md, HADES triangular note).
 *  B) hdr_*: HADES with FILTER_AND_SUM beamforming + the radial editor
 *     applied between analysis and synthesis each block, with a dB ramp
 *     that exercises both the -60 and +12 dB clamps
 *     (hades_radial_editor_apply, saf_hades_synthesis.c:77-99).
 *  C) hdh_*: HADES with hybrid-mode afSTFT in the NON-low-delay variant
 *     (HADES_USE_AFSTFT), BMVDR — pins the hop-64 hybrid filterbank path.
 *  D) btp_*: binauraliser example end-to-end with INTERP_TRI_PS
 *     (binauraliser_internal.c:90: magnitude+ITD interpolation with
 *     phase synthesis).
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

#include "saf.h"
#include "saf_hades_analysis.h"
#include "saf_hades_synthesis.h"
#include "saf_hades_internal.h"
#include "binauraliser.h"

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

static unsigned int lcg_state;
static float lcg_noise(void)
{
    lcg_state = lcg_state * 1664525u + 1013904223u;
    return (float)(lcg_state >> 8) / 8388608.0f - 1.0f;
}

/* One HADES run: builds a deterministic 6-mic array on the 36-dir t-design
 * grid (fresh LCG seed per run), renders a mono source at grid dir src_idx
 * + a -40 dB floor, and processes nBlocks blocks.  binConfig/hrir inputs,
 * beamformer/interp options and the optional radial edit vary per run. */
static void hades_run(const char* pfx, unsigned int seed,
                      HADES_FILTERBANKS fbOpt, int hybridmode,
                      HADES_BEAMFORMER_TYPE beamOpt, int enableCM,
                      HADES_HRTF_INTERP_OPTIONS interpOpt,
                      hades_binaural_config* binConfig,
                      int src_idx, int nBlocks, int with_redit)
{
    const int fs = 48000, hopsize = 64, blocksize = 256;
    const int nGrid = 36, nMics = 6, h_len = 32;
    const int sigLen = blocksize * nBlocks;
    int i, j, t, ch, blk;
    char nm[64], sh[64];

    lcg_state = seed;
    float* grid_dirs_deg = (float*)__Tdesign_degree_8_dirs_deg;
    float* h_array = malloc1d(nGrid * nMics * h_len * sizeof(float));
    for (i = 0; i < nGrid * nMics; i++)
        for (t = 0; t < h_len; t++)
            h_array[i * h_len + t] = lcg_noise() * expf(-(float)t / 10.0f);
    snprintf(nm, sizeof(nm), "%s_h_array", pfx);
    dump(nm, h_array, (size_t)nGrid * nMics * h_len, "f4", "36,6,32");

    hades_analysis_handle hAna = NULL;
    hades_analysis_create(&hAna, (float)fs, fbOpt, hopsize, blocksize,
                          hybridmode, h_array, grid_dirs_deg, nGrid, nMics,
                          h_len, HADES_USE_COMEDIE, HADES_USE_MUSIC);
    hades_analysis_data* a = (hades_analysis_data*)hAna;
    const int nBands = a->nBands;
    snprintf(nm, sizeof(nm), "%s_freq_vector", pfx);
    snprintf(sh, sizeof(sh), "%d", nBands);
    dump(nm, a->freqVector, nBands, "f4", sh);

    hades_param_container_handle hPCon = NULL;
    hades_signal_container_handle hSCon = NULL;
    hades_param_container_create(&hPCon, hAna);
    hades_signal_container_create(&hSCon, hAna);

    int refIndices[2] = {1, 5};
    hades_synthesis_handle hSyn = NULL;
    hades_synthesis_create(&hSyn, hAna, beamOpt, enableCM, refIndices,
                           binConfig, interpOpt);
    hades_synthesis_data* s = (hades_synthesis_data*)hSyn;
    snprintf(nm, sizeof(nm), "%s_H_bin", pfx);
    snprintf(sh, sizeof(sh), "%d,2,%d", nBands, nGrid);
    dump(nm, s->H_bin, (size_t)nBands * 2 * nGrid, "c8", sh);
    snprintf(nm, sizeof(nm), "%s_diff_eq", pfx);
    snprintf(sh, sizeof(sh), "%d", nBands);
    dump(nm, s->diffEQ, nBands, "f4", sh);

    hades_radial_editor_handle hREd = NULL;
    float dirGain_dB[360];
    if (with_redit) {
        hades_radial_editor_create(&hREd, hAna);
        /* ramp crossing both clamps: -70 dB at az 0 up to +91.6 at az 359 */
        for (i = 0; i < 360; i++)
            dirGain_dB[i] = -70.0f + 0.45f * (float)i;
    }

    float* mono = malloc1d(sigLen * sizeof(float));
    for (t = 0; t < sigLen; t++)
        mono[t] = lcg_noise();
    float** inSig = (float**)calloc2d(nMics, sigLen, sizeof(float));
    for (ch = 0; ch < nMics; ch++) {
        const float* h = &h_array[(src_idx * nMics + ch) * h_len];
        for (t = 0; t < sigLen; t++) {
            float acc = 0.0f;
            for (j = 0; j < h_len && j <= t; j++)
                acc += h[j] * mono[t - j];
            inSig[ch][t] = acc + 0.01f * lcg_noise();
        }
    }
    snprintf(nm, sizeof(nm), "%s_in", pfx);
    snprintf(sh, sizeof(sh), "%d,%d", nMics, sigLen);
    dump(nm, FLATTEN2D(inSig), (size_t)nMics * sigLen, "f4", sh);

    hades_param_container_data* pcon = (hades_param_container_data*)hPCon;
    float** inBlk = (float**)malloc2d(nMics, blocksize, sizeof(float));
    float** outBlk = (float**)malloc2d(2, blocksize, sizeof(float));
    float* diff_all = malloc1d(nBlocks * nBands * sizeof(float));
    float* doa_all = malloc1d(nBlocks * nBands * sizeof(float));
    float* out_all = malloc1d(2 * sigLen * sizeof(float));
    float* gains_last = malloc1d(nBands * sizeof(float));
    for (blk = 0; blk < nBlocks; blk++) {
        for (ch = 0; ch < nMics; ch++)
            memcpy(inBlk[ch], &inSig[ch][blk * blocksize],
                   blocksize * sizeof(float));
        hades_analysis_apply(hAna, inBlk, nMics, blocksize, hPCon, hSCon);
        if (with_redit)
            hades_radial_editor_apply(hREd, hPCon, dirGain_dB);
        memcpy(&diff_all[blk * nBands], pcon->diffuseness,
               nBands * sizeof(float));
        for (i = 0; i < nBands; i++)
            doa_all[blk * nBands + i] = (float)pcon->doa_idx[i];
        memcpy(gains_last, pcon->gains_dir, nBands * sizeof(float));
        hades_synthesis_apply(hSyn, hPCon, hSCon, 2, blocksize, outBlk);
        for (ch = 0; ch < 2; ch++)
            memcpy(&out_all[ch * sigLen + blk * blocksize], outBlk[ch],
                   blocksize * sizeof(float));
    }
    snprintf(nm, sizeof(nm), "%s_diffuseness", pfx);
    snprintf(sh, sizeof(sh), "%d,%d", nBlocks, nBands);
    dump(nm, diff_all, (size_t)nBlocks * nBands, "f4", sh);
    snprintf(nm, sizeof(nm), "%s_doa_idx", pfx);
    dump(nm, doa_all, (size_t)nBlocks * nBands, "f4", sh);
    if (with_redit) {
        snprintf(nm, sizeof(nm), "%s_gains_dir", pfx);
        snprintf(sh, sizeof(sh), "%d", nBands);
        dump(nm, gains_last, nBands, "f4", sh);
    }
    snprintf(nm, sizeof(nm), "%s_out", pfx);
    snprintf(sh, sizeof(sh), "2,%d", sigLen);
    dump(nm, out_all, (size_t)2 * sigLen, "f4", sh);
    printf("%s done (nBands=%d)\n", pfx, nBands);

    hades_analysis_destroy(&hAna);
    hades_param_container_destroy(&hPCon);
    hades_signal_container_destroy(&hSCon);
    hades_synthesis_destroy(&hSyn);
    if (with_redit) hades_radial_editor_destroy(&hREd);
    free(h_array); free(mono); free(inSig); free(inBlk); free(outBlk);
    free(diff_all); free(doa_all); free(out_all); free(gains_last);
}

/* -------------------------------------------------------------------- */
static void golden_binauraliser_tri_ps(void)
{
    const int fs = 48000, nSrc = 2;
    int i, ch, frame;
    void* h;
    lcg_state = 848484u;
    binauraliser_create(&h);
    binauraliser_init(h, fs);
    binauraliser_setNumSources(h, nSrc);
    binauraliser_setSourceAzi_deg(h, 0, 20.0f);
    binauraliser_setSourceElev_deg(h, 0, -30.0f);
    binauraliser_setSourceAzi_deg(h, 1, -70.0f);
    binauraliser_setSourceElev_deg(h, 1, 35.0f);
    binauraliser_setInterpMode(h, INTERP_TRI_PS);
    binauraliser_initCodec(h);

    const int framesize = binauraliser_getFrameSize();
    const int nFrames = 48;
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
    dump("btp_in", FLATTEN2D(inSig), (size_t)nSrc * sigLen, "f4", shape);
    snprintf(shape, sizeof(shape), "%d,%d", NUM_EARS, sigLen);
    dump("btp_out", FLATTEN2D(binSig), (size_t)NUM_EARS * sigLen, "f4",
         shape);
    binauraliser_destroy(&h);
    free(inSig); free(binSig); free(inFr); free(outFr);
    printf("btp done\n");
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

    /* A) triangular interp on a matched 36-dir synthetic HRIR set.  Each
     * HRIR is a dominant pulse at a direction/ear-dependent integer delay
     * plus a -30 dB decaying noise tail, so estimateITDs' correlation peak
     * is unambiguous (pure random HRIRs leave the argmax at the f32 noise
     * floor, and a one-sample ITD flip is a pi phase flip at 24 kHz).
     * The inter-ear delay is +-1 sample and hrir_fs is declared 44100
     * (neither side resamples: hrir_fs only feeds estimateITDs,
     * saf_hades_internal.c:75): interpHRTFs' IPD chain (saf_hrir.c:302-303)
     * wraps 2pi*f_k*itd + pi with fmodf, and ANY integer-sample ITD at
     * fs=48k puts some band (fs/4 for even, fs/2 for odd) exactly on the
     * f32 wrap boundary, where the ipd sign is decided by the last ULP of
     * the VBAP-normalised interpolation weights; itd = 1/44100 against
     * 375 Hz-spaced bands keeps every band off the boundary. */
    {
        const int nH = 36, lH = 64;
        lcg_state = 515151u;
        float* hrirs = malloc1d(nH * 2 * lH * sizeof(float));
        int i, d, e, t;
        memset(hrirs, 0, (size_t)nH * 2 * lH * sizeof(float));
        for (d = 0; d < nH; d++)
            for (e = 0; e < 2; e++) {
                int dly = 4 + (d * 7) % 9 + (e ? ((d % 2) ? 1 : -1) : 0);
                i = d * 2 + e;
                hrirs[i * lH + dly] = 0.8f + 0.1f * lcg_noise();
                for (t = dly + 1; t < lH; t++)
                    hrirs[i * lH + t] = 0.03f * lcg_noise()
                        * expf(-(float)(t - dly) / 12.0f);
            }
        dump("hdt_hrirs", hrirs, (size_t)nH * 2 * lH, "f4", "36,2,64");
        {
            float itds[36];
            estimateITDs(hrirs, nH, lH, 44100, itds);
            dump("hdt_itds", itds, nH, "f4", "36");
        }
        hades_binaural_config bc;
        bc.hrir_fs = 44100; bc.lHRIR = lH; bc.nHRIR = nH;
        bc.hrirs = hrirs;
        bc.hrir_dirs_deg = (float*)__Tdesign_degree_8_dirs_deg;
        hades_run("hdt", 515152u, HADES_USE_AFSTFT_LD, 0,
                  HADES_BEAMFORMER_NONE, 0, HADES_HRTF_INTERP_TRIANGULAR,
                  &bc, 5, 12, 0);
        free(hrirs);
    }
    /* B) filter-and-sum + radial editor, default HRIRs */
    {
        hades_binaural_config bc;
        bc.hrir_fs = __default_hrir_fs;
        bc.lHRIR = __default_hrir_len;
        bc.nHRIR = __default_N_hrir_dirs;
        bc.hrirs = (float*)__default_hrirs;
        bc.hrir_dirs_deg = (float*)__default_hrir_dirs_deg;
        hades_run("hdr", 626262u, HADES_USE_AFSTFT_LD, 0,
                  HADES_BEAMFORMER_FILTER_AND_SUM, 1,
                  HADES_HRTF_INTERP_NEAREST, &bc, 23, 12, 1);
    }
    /* C) hybrid-mode afSTFT, non-low-delay, BMVDR */
    {
        hades_binaural_config bc;
        bc.hrir_fs = __default_hrir_fs;
        bc.lHRIR = __default_hrir_len;
        bc.nHRIR = __default_N_hrir_dirs;
        bc.hrirs = (float*)__default_hrirs;
        bc.hrir_dirs_deg = (float*)__default_hrir_dirs_deg;
        hades_run("hdh", 737373u, HADES_USE_AFSTFT, 1,
                  HADES_BEAMFORMER_BMVDR, 1, HADES_HRTF_INTERP_NEAREST,
                  &bc, 11, 8, 0);
    }
    /* D) binauraliser TRI_PS */
    golden_binauraliser_tri_ps();

    fclose(manifest);
    return 0;
}
