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
    size_t esz = strcmp(dtype, "c8") == 0 ? 8 : 4;
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

    fclose(manifest);
    return 0;
}
