/* Golden-fixture generator, part 11: the decorrelator example with the
 * transient ducker + level compensation engaged (decorrelator.c:195-221:
 * ducker residual -> lattice, wet *= 0.75*nCH/sqrt(nCH), transients
 * re-introduced, wet/dry mix against the ORIGINAL input frame), and the
 * FuMa<->ACN channel-convention swaps (saf_hoa.c:40-70).
 *
 * The decorrelator golden runs FIRST in this process so its lattice-delay
 * rand() draws start at glibc-rand offset 0 (cf. gen_goldens9 where
 * binauraliser_nf's convhull jitter ran first -> offset 5016).
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

#include "saf.h"
#include "decorrelator.h"

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

static unsigned int lcg_state = 77711u;
static float lcg_noise(void)
{
    lcg_state = lcg_state * 1664525u + 1013904223u;
    return (float)(lcg_state >> 8) / 8388608.0f - 1.0f;
}

/* -------------------------------------------------------------------- */
static void golden_decorrelator_ducker(void)
{
    const int nCH = 4, nFrames = 64;
    const int frame = decorrelator_getFrameSize();
    int i, f;
    void* h;
    decorrelator_create(&h);
    decorrelator_init(h, 48000);
    decorrelator_setNumberOfChannels(h, nCH);
    decorrelator_setDecorrelationAmount(h, 0.8f);
    decorrelator_setLevelCompensationFlag(h, 1);
    decorrelator_setTransientBypassFlag(h, 1);  /* enableTransientDucker=1 */
    decorrelator_initCodec(h);

    float** in = (float**)malloc2d(nCH, nFrames * frame, sizeof(float));
    float** inF = (float**)malloc2d(nCH, frame, sizeof(float));
    float** outF = (float**)malloc2d(nCH, frame, sizeof(float));
    float* out = malloc1d((size_t)nCH * nFrames * frame * sizeof(float));
    /* noise bed + strong periodic transients so the ducker really splits */
    for (i = 0; i < nCH; i++)
        for (f = 0; f < nFrames * frame; f++) {
            in[i][f] = 0.25f * lcg_noise();
            if (f % 1536 == (97 * (i + 1)) % 1536)
                in[i][f] += 4.0f;
        }
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
    dump("dkr_in", FLATTEN2D(in), (size_t)nCH * nFrames * frame, "f4", sh);
    dump("dkr_out", out, (size_t)nCH * nFrames * frame, "f4", sh);
    float meta[1] = {(float)frame};
    dump("dkr_frame", meta, 1, "f4", "1");
    decorrelator_destroy(&h);
    free(in); free(inF); free(outF); free(out);
}

/* -------------------------------------------------------------------- */
static void golden_fuma_conversion(void)
{
    /* order-2 signal, 4 samples per channel; FuMa->ACN zeroes ch >= 4 */
    const int order = 2, nSH = 9, len = 4;
    float sig[9 * 4], sig2[9 * 4];
    int i;
    for (i = 0; i < nSH * len; i++)
        sig[i] = (float)(i + 1) + 0.25f * (float)((i * 7) % 5);
    memcpy(sig2, sig, sizeof(sig));
    dump("fuma_sig", sig, nSH * len, "f4", "9,4");
    convertHOAChannelConvention(sig, order, len, HOA_CH_ORDER_FUMA,
                                HOA_CH_ORDER_ACN);
    dump("fuma_to_acn", sig, nSH * len, "f4", "9,4");
    convertHOAChannelConvention(sig2, order, len, HOA_CH_ORDER_ACN,
                                HOA_CH_ORDER_FUMA);
    dump("acn_to_fuma", sig2, nSH * len, "f4", "9,4");
    /* maxN norm gains (FuMa pairing), both directions, order 1 */
    float g[4 * 4];
    for (i = 0; i < 16; i++) g[i] = 1.0f;
    convertHOANormConvention(g, 1, 4, HOA_NORM_FUMA, HOA_NORM_N3D);
    dump("fuma_norm_to_n3d", g, 16, "f4", "4,4");
    for (i = 0; i < 16; i++) g[i] = 1.0f;
    convertHOANormConvention(g, 1, 4, HOA_NORM_N3D, HOA_NORM_FUMA);
    dump("n3d_norm_to_fuma", g, 16, "f4", "4,4");
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

    golden_decorrelator_ducker();
    printf("decorrelator(ducker) goldens done\n");
    golden_fuma_conversion();
    printf("fuma conversion goldens done\n");

    fclose(manifest);
    return 0;
}
