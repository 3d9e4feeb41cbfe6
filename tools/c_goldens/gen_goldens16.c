/* Golden-fixture generator, part 16: the ambi_dec option branches that
 * stage 8's end-to-end pin (ALLRAD dual-band, loudspeaker out) left
 * uncovered —
 *   A) binauraliseLS: headphone preview of the decoded loudspeaker feeds
 *      (per-LS TRI_PS HRTF interpolation + 1/sqrt(nLS), ambi_dec.c:543-563)
 *   B) SAD/EPAD decoders with AMPLITUDE_PRESERVING diffuse-field EQ
 *      (the M_norm[..][0] branch, ambi_dec.c:539)
 *   C) per-band decoding-order truncation (orderPerBand < masterOrder,
 *      ambi_dec.c:520-522) with MMD decoders
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

#include "saf.h"
#include "ambi_dec.h"
#include "ambi_dec_internal.h"
#include "ambi_enc.h"
#include "panner.h"
#include "ambi_bin.h"

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

static unsigned int lcg_state = 161616u;
static float lcg_noise(void)
{
    lcg_state = lcg_state * 1664525u + 1013904223u;
    return (float)(lcg_state >> 8) / 8388608.0f - 1.0f;
}

static void fill_noise(float** buf, int nch, int len)
{
    int i, t;
    for (i = 0; i < nch; i++)
        for (t = 0; t < len; t++)
            buf[i][t] = lcg_noise();
}

#define RUN_FRAMES(procfn, h, in, out, nIn, nOut, frame, nFrames, inF, outF) \
    do {                                                                     \
        int f_, i_;                                                          \
        for (f_ = 0; f_ < (nFrames); f_++) {                                 \
            for (i_ = 0; i_ < (nIn); i_++)                                   \
                memcpy((inF)[i_], &(in)[i_][f_ * (frame)],                   \
                       (frame) * sizeof(float));                             \
            procfn((h), (const float* const*)(inF), (outF), (nIn), (nOut),   \
                   (frame));                                                 \
            for (i_ = 0; i_ < (nOut); i_++)                                  \
                memcpy(&(out)[(size_t)i_ * (nFrames) * (frame)               \
                              + f_ * (frame)], (outF)[i_],                   \
                       (frame) * sizeof(float));                             \
        }                                                                    \
    } while (0)

static const float ls_dirs[9][2] = {
    {0.0f, -3.0f}, {47.0f, 2.0f}, {-42.0f, 1.0f}, {88.0f, -2.0f},
    {-93.0f, 0.0f}, {132.0f, 3.0f}, {-138.0f, -1.0f},
    {30.0f, 40.0f}, {-60.0f, 28.0f}};

/* One configured ambi_dec run: pfx_{in,out} dumped, nOut channels. */
static void ambi_dec_run(const char* pfx, unsigned int seed, int binauralise,
                         int dec_low, int dec_high, int maxre_low,
                         int maxre_high, int diffeq_low, int diffeq_high,
                         const int* order_per_band)
{
    const int order = 3, nsh = 16, nLS = 9, nFrames = 32;
    const int frame = ambi_dec_getFrameSize();
    const int nBands = ambi_dec_getNumberOfBands();
    const int nOut = binauralise ? 2 : nLS;
    int i;
    void* h;
    lcg_state = seed;
    ambi_dec_create(&h);
    ambi_dec_init(h, 48000);
    ambi_dec_setMasterDecOrder(h, order);
    if (order_per_band) {
        for (i = 0; i < nBands; i++)
            ambi_dec_setDecOrder(h, order_per_band[i], i);
    } else
        ambi_dec_setDecOrderAllBands(h, order);
    ambi_dec_setNormType(h, NORM_N3D);
    ambi_dec_setNumLoudspeakers(h, nLS);
    for (i = 0; i < nLS; i++) {
        ambi_dec_setLoudspeakerAzi_deg(h, i, ls_dirs[i][0]);
        ambi_dec_setLoudspeakerElev_deg(h, i, ls_dirs[i][1]);
    }
    ambi_dec_setBinauraliseLSflag(h, binauralise);
    ambi_dec_setDecMethod(h, 0, dec_low);
    ambi_dec_setDecMethod(h, 1, dec_high);
    ambi_dec_setDecEnableMaxrE(h, 0, maxre_low);
    ambi_dec_setDecEnableMaxrE(h, 1, maxre_high);
    ambi_dec_setDecNormType(h, 0, diffeq_low);
    ambi_dec_setDecNormType(h, 1, diffeq_high);
    ambi_dec_setTransitionFreq(h, 800.0f);
    ambi_dec_initCodec(h);

    float** in = (float**)malloc2d(nsh, nFrames * frame, sizeof(float));
    float** inF = (float**)malloc2d(nsh, frame, sizeof(float));
    float** outF = (float**)malloc2d(nOut, frame, sizeof(float));
    float* out = malloc1d((size_t)nOut * nFrames * frame * sizeof(float));
    fill_noise(in, nsh, nFrames * frame);
    RUN_FRAMES(ambi_dec_process, h, in, out, nsh, nOut, frame, nFrames,
               inF, outF);
    if (binauralise) {
        /* dump the per-LS interpolated HRTFs actually used (filled during
         * process by ambi_dec_interpHRTFs) to isolate design-time parity */
        ambi_dec_data* pData = (ambi_dec_data*)h;
        float_complex* hi = malloc1d((size_t)nLS * HYBRID_BANDS * NUM_EARS
                                     * sizeof(float_complex));
        int ch, b, e;
        for (ch = 0; ch < nLS; ch++)
            for (b = 0; b < HYBRID_BANDS; b++)
                for (e = 0; e < NUM_EARS; e++)
                    hi[((size_t)ch * HYBRID_BANDS + b) * NUM_EARS + e] =
                        pData->pars->hrtf_interp[ch][b][e];
        char nm2[64], sh2[32];
        snprintf(nm2, sizeof(nm2), "%s_hinterp", pfx);
        snprintf(sh2, sizeof(sh2), "%d,%d,%d", nLS, HYBRID_BANDS, NUM_EARS);
        dump(nm2, hi, (size_t)nLS * HYBRID_BANDS * NUM_EARS, "c8", sh2);
        free(hi);
        /* the compressed VBAP interpolation table (weights + HRIR indices) */
        {
            int nT = pData->pars->N_hrtf_vbap_gtable;
            float* idx_f = malloc1d((size_t)nT * 3 * sizeof(float));
            for (b = 0; b < nT * 3; b++)
                idx_f[b] = (float)pData->pars->hrtf_vbap_gtableIdx[b];
            snprintf(nm2, sizeof(nm2), "%s_vbap_w", pfx);
            snprintf(sh2, sizeof(sh2), "%d,3", nT);
            dump(nm2, pData->pars->hrtf_vbap_gtableComp, (size_t)nT * 3,
                 "f4", sh2);
            snprintf(nm2, sizeof(nm2), "%s_vbap_idx", pfx);
            dump(nm2, idx_f, (size_t)nT * 3, "f4", sh2);
            free(idx_f);
        }
    }
    char nm[64], sh[32];
    snprintf(nm, sizeof(nm), "%s_in", pfx);
    snprintf(sh, sizeof(sh), "%d,%d", nsh, nFrames * frame);
    dump(nm, FLATTEN2D(in), (size_t)nsh * nFrames * frame, "f4", sh);
    snprintf(nm, sizeof(nm), "%s_out", pfx);
    snprintf(sh, sizeof(sh), "%d,%d", nOut, nFrames * frame);
    dump(nm, out, (size_t)nOut * nFrames * frame, "f4", sh);
    ambi_dec_destroy(&h);
    free(in); free(inF); free(outF); free(out);
    printf("%s done\n", pfx);
}

/* per-source gain + solo/unsolo changes mid-stream (ambi_enc.c:135-137,
 * setSourceSolo/setUnSolo): gains hit the input frame that feeds the NEXT
 * output frame (the encode gemm reads prev_inputFrameTD) */
static void golden_ambi_enc_gains(void)
{
    const int order = 2, nsh = 9, nSrc = 3, nFrames = 32;
    const int frame = ambi_enc_getFrameSize();
    const float dirs[3][2] = {{30.0f, 0.0f}, {-45.0f, 12.0f}, {110.0f, -25.0f}};
    int i, f;
    void* h;
    lcg_state = 171717u;
    ambi_enc_create(&h);
    ambi_enc_init(h, 48000);
    ambi_enc_setOutputOrder(h, order);
    ambi_enc_setNormType(h, NORM_N3D);
    ambi_enc_setNumSources(h, nSrc);
    for (i = 0; i < nSrc; i++) {
        ambi_enc_setSourceAzi_deg(h, i, dirs[i][0]);
        ambi_enc_setSourceElev_deg(h, i, dirs[i][1]);
    }
    float** in = (float**)malloc2d(nSrc, nFrames * frame, sizeof(float));
    float** inF = (float**)malloc2d(nSrc, frame, sizeof(float));
    float** outF = (float**)malloc2d(nsh, frame, sizeof(float));
    float* out = malloc1d((size_t)nsh * nFrames * frame * sizeof(float));
    fill_noise(in, nSrc, nFrames * frame);
    for (f = 0; f < nFrames; f++) {
        if (f == 8) {
            ambi_enc_setSourceGain(h, 0, 0.5f);
            ambi_enc_setSourceGain(h, 1, 2.0f);
        } else if (f == 16)
            ambi_enc_setSourceSolo(h, 2);
        else if (f == 24)
            ambi_enc_setUnSolo(h);
        for (i = 0; i < nSrc; i++)
            memcpy(inF[i], &in[i][f * frame], frame * sizeof(float));
        ambi_enc_process(h, (const float* const*)inF, outF, nSrc, nsh,
                         frame);
        for (i = 0; i < nsh; i++)
            memcpy(&out[(size_t)i * nFrames * frame + f * frame], outF[i],
                   frame * sizeof(float));
    }
    char sh[32];
    snprintf(sh, sizeof(sh), "%d,%d", nSrc, nFrames * frame);
    dump("aeg_in", FLATTEN2D(in), (size_t)nSrc * nFrames * frame, "f4", sh);
    snprintf(sh, sizeof(sh), "%d,%d", nsh, nFrames * frame);
    dump("aeg_out", out, (size_t)nsh * nFrames * frame, "f4", sh);
    dump("aeg_dirs", dirs, 6, "f4", "3,2");
    ambi_enc_destroy(&h);
    free(in); free(inF); free(outF); free(out);
    printf("aeg done\n");
}

/* panner with a general yaw/pitch/roll head rotation (panner.c:212-223):
 * source unit vectors as ROWS times Rzyx (NoTrans) — a transposed rotation
 * is symmetric under yaw-only pins, so use all three angles */
static void golden_panner_ypr(void)
{
    const float ls_dirs[9][2] = {
        {0.0f, -3.0f}, {47.0f, 2.0f}, {-42.0f, 1.0f}, {88.0f, -2.0f},
        {-93.0f, 0.0f}, {132.0f, 3.0f}, {-138.0f, -1.0f},
        {30.0f, 40.0f}, {-60.0f, 28.0f}};
    const float src_dirs[2][2] = {{20.0f, 10.0f}, {-75.0f, -5.0f}};
    const float ypr_deg[3] = {20.0f, -10.0f, 5.0f};
    const int nLS = 9, nSrc = 2, frame = 128, nFrames = 32;
    const int sigLen = frame * nFrames;
    int i, f;
    void* h;
    lcg_state = 181818u;
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
    panner_setYaw(h, ypr_deg[0]);
    panner_setPitch(h, ypr_deg[1]);
    panner_setRoll(h, ypr_deg[2]);
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
    dump("pyr_in", FLATTEN2D(in), (size_t)nSrc * sigLen, "f4", "2,4096");
    dump("pyr_out", out, (size_t)nLS * sigLen, "f4", "9,4096");
    dump("pyr_ypr_deg", ypr_deg, 3, "f4", "3");
    free(in); free(inF); free(outF); free(out);
    printf("pyr done\n");
}

/* SMB pitch shifter at a DOWNSHIFT (0.5: several analysis bins collapse
 * onto one synthesis bin — the C's gSynFreq assignment is last-k-wins,
 * saf_utility_pitch.c:310-316) and a 2.0 upshift (half the bins map out of
 * range and are SKIPPED, not zeroed); stage 3 pinned only 1.5 */
static void golden_pitch_shifts(void)
{
    const int T = 8192, fftsize = 4096, osamp = 4;
    float* in = malloc1d(T * sizeof(float));
    float* out = malloc1d(T * sizeof(float));
    int i;
    for (i = 0; i < T; i++)
        in[i] = 0.5f * sinf(2.0f * (float)M_PI * 220.5f * i / 48000.0f);
    void* h;
    smb_pitchShift_create(&h, 1, fftsize, osamp, 48000.0f);
    smb_pitchShift_apply(h, 0.5f, T, in, out);
    dump("pitch_out_0p5", out, T, "f4", "8192");
    smb_pitchShift_destroy(&h);
    smb_pitchShift_create(&h, 1, fftsize, osamp, 48000.0f);
    smb_pitchShift_apply(h, 2.0f, T, in, out);
    dump("pitch_out_2p0", out, T, "f4", "8192");
    smb_pitchShift_destroy(&h);
    free(in); free(out);
    printf("pitch shifts done\n");
}

/* interpolateFiltersH (saf_utility_filters.c): IFFT -> half-rotate -> FFT
 * spectral resampling, both up (256->512) and down (256->128); layout is
 * bin-major (filters_in[bin*nFilters + i]) */
static void golden_interp_filters_h(void)
{
    const int inF = 256, nFilt = 3;
    const int nbi = inF / 2 + 1;
    int i;
    lcg_state = 232323u;
    float_complex* fin = malloc1d((size_t)nbi * nFilt
                                  * sizeof(float_complex));
    for (i = 0; i < nbi * nFilt; i++)
        fin[i] = cmplxf(lcg_noise(), lcg_noise());
    {
        const int outF = 512, nbo = outF / 2 + 1;
        float_complex* fout = malloc1d((size_t)nbo * nFilt
                                       * sizeof(float_complex));
        interpolateFiltersH(inF, outF, nFilt, fin, fout);
        dump("ifh_out_up", fout, (size_t)nbo * nFilt, "c8", "257,3");
        free(fout);
    }
    {
        const int outF = 128, nbo = outF / 2 + 1;
        float_complex* fout = malloc1d((size_t)nbo * nFilt
                                       * sizeof(float_complex));
        interpolateFiltersH(inF, outF, nFilt, fin, fout);
        dump("ifh_out_down", fout, (size_t)nbo * nFilt, "c8", "65,3");
        free(fout);
    }
    dump("ifh_in", fin, (size_t)nbi * nFilt, "c8", "129,3");
    free(fin);
    printf("ifh done\n");
}

/* panner with a PLANAR loudspeaker ring: sum|elev| < 0.01 switches the C
 * to the 2-D pairwise tangent-law table + azimuth-only lookup
 * (panner_internal.c:62-95, panner.c:282-284) */
static void golden_panner_2d(void)
{
    const float ls_dirs[5][2] = {
        {0.0f, 0.0f}, {30.0f, 0.0f}, {-30.0f, 0.0f},
        {110.0f, 0.0f}, {-110.0f, 0.0f}};
    const float src_dirs[2][2] = {{12.0f, 0.0f}, {-75.0f, 20.0f}};
    const int nLS = 5, nSrc = 2, frame = 128, nFrames = 32;
    const int sigLen = frame * nFrames;
    int i, f;
    void* h;
    lcg_state = 212121u;
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
    dump("p2d_ls_dirs", ls_dirs, 10, "f4", "5,2");
    dump("p2d_src_dirs", src_dirs, 4, "f4", "2,2");
    dump("p2d_in", FLATTEN2D(in), (size_t)nSrc * sigLen, "f4", "2,4096");
    dump("p2d_out", out, (size_t)nLS * sigLen, "f4", "5,4096");
    free(in); free(inF); free(outF); free(out);
    printf("p2d done\n");
}

/* ambi_bin with FuMa input conventions AND head rotation: the C converts
 * the signal FuMa->ACN FIRST, then applies M_dec*M_rot (ambi_bin.c:420-455)
 * — the order-1 channel permutation does not commute with the SH rotation,
 * so a decoder that folds the conversion on the wrong side of the rotation
 * rotates about the wrong axes.  Random per-channel input (not an encoded
 * plane wave) so the permutation actually matters. */
static void golden_ambi_bin_fuma_rot(void)
{
    const int order = 1, fs = 48000, nSH = 4;
    int i, ch, frame;
    void* h;
    lcg_state = 202020u;
    ambi_bin_create(&h);
    ambi_bin_setNormType(h, NORM_FUMA);
    ambi_bin_setChOrder(h, CH_FUMA);
    ambi_bin_setInputOrderPreset(h, SH_ORDER_FIRST);
    ambi_bin_init(h, fs);
    ambi_bin_setEnableRotation(h, 1);
    ambi_bin_setYaw(h, 20.0f);
    ambi_bin_setPitch(h, -10.0f);
    ambi_bin_setRoll(h, 5.0f);
    ambi_bin_initCodec(h);

    const int framesize = ambi_bin_getFrameSize();
    const int nFrames = 32;
    const int sigLen = nFrames * framesize;
    float** shSig = (float**)malloc2d(nSH, sigLen, sizeof(float));
    for (ch = 0; ch < nSH; ch++)
        for (i = 0; i < sigLen; i++)
            shSig[ch][i] = lcg_noise();
    float** binSig = (float**)calloc2d(NUM_EARS, sigLen, sizeof(float));
    float** inFr = (float**)malloc1d(nSH * sizeof(float*));
    float** outFr = (float**)malloc1d(NUM_EARS * sizeof(float*));
    for (frame = 0; frame < nFrames; frame++) {
        for (ch = 0; ch < nSH; ch++)
            inFr[ch] = &shSig[ch][frame * framesize];
        for (ch = 0; ch < NUM_EARS; ch++)
            outFr[ch] = &binSig[ch][frame * framesize];
        ambi_bin_process(h, (const float* const*)inFr, outFr, nSH,
                         NUM_EARS, framesize);
    }
    char sh[32];
    snprintf(sh, sizeof(sh), "%d,%d", nSH, sigLen);
    dump("abf_in", FLATTEN2D(shSig), (size_t)nSH * sigLen, "f4", sh);
    snprintf(sh, sizeof(sh), "2,%d", sigLen);
    dump("abf_out", FLATTEN2D(binSig), (size_t)NUM_EARS * sigLen, "f4", sh);
    ambi_bin_destroy(&h);
    free(shSig); free(binSig); free(inFr); free(outFr);
    printf("abf done\n");
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

    /* A) binauraliseLS headphone preview, ALLRAD dual-band as in stage 8 */
    ambi_dec_run("adb", 161617u, 1,
                 LOUDSPEAKER_DECODER_ALLRAD, LOUDSPEAKER_DECODER_ALLRAD,
                 0, 1, ENERGY_PRESERVING, ENERGY_PRESERVING, NULL);

    /* B) SAD low / EPAD high, amplitude-preserving EQ, no maxrE */
    ambi_dec_run("ada", 161618u, 0,
                 LOUDSPEAKER_DECODER_SAD, LOUDSPEAKER_DECODER_EPAD,
                 0, 0, AMPLITUDE_PRESERVING, AMPLITUDE_PRESERVING, NULL);

    /* C) MMD both bands, per-band order: 1 below band 40, 3 above */
    {
        const int nBands = ambi_dec_getNumberOfBands();
        int* opb = malloc1d(nBands * sizeof(int));
        int b;
        float* opb_f = malloc1d(nBands * sizeof(float));
        for (b = 0; b < nBands; b++)
            opb[b] = b < 40 ? 1 : 3;
        ambi_dec_run("adm", 161619u, 0,
                     LOUDSPEAKER_DECODER_MMD, LOUDSPEAKER_DECODER_MMD,
                     1, 1, ENERGY_PRESERVING, ENERGY_PRESERVING, opb);
        for (b = 0; b < nBands; b++)
            opb_f[b] = (float)opb[b];
        char sh[16];
        snprintf(sh, sizeof(sh), "%d", nBands);
        dump("adm_order_per_band", opb_f, nBands, "f4", sh);
        free(opb); free(opb_f);
    }
    dump("ad16_ls_dirs", ls_dirs, 18, "f4", "9,2");

    /* D) ambi_enc per-source gains + solo */
    golden_ambi_enc_gains();

    /* E) panner under a general head rotation */
    golden_panner_ypr();

    /* F) pitch shifter at 0.5 and 2.0 */
    golden_pitch_shifts();

    /* G) ambi_bin: FuMa conventions + head rotation */
    golden_ambi_bin_fuma_rot();

    /* H) panner on a planar ring (2-D pairwise path) */
    golden_panner_2d();

    /* I) interpolateFiltersH spectral resampling */
    golden_interp_filters_h();


    fclose(manifest);
    return 0;
}
