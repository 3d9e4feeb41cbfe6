/* Golden-fixture generator, part 8: the remaining example renderers —
 * ambi_enc, rotator, beamformer, ambi_dec (dual-band decoding with a
 * transition frequency), dirass (directional re-assignment maps), and the
 * FORK's roombinauraliser (default-HRIR path with FABIAN-CTF diffuse EQ).
 *
 * roombinauraliser is not registered in the reference's examples
 * CMakeLists (fork delta #2 in SURVEY.md) — its sources are compiled
 * directly into this generator.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

#include "saf.h"
#include "ambi_enc.h"
#include "rotator.h"
#include "beamformer.h"
#include "ambi_dec.h"
#include "dirass.h"
#include "roombinauraliser.h"

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

static unsigned int lcg_state = 24680u;
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

/* run an example's frame loop over pre-generated input, collecting output */
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

/* -------------------------------------------------------------------- */
static void golden_ambi_enc(void)
{
    const int order = 3, nsh = 16, nSrc = 3, nFrames = 32;
    const int frame = ambi_enc_getFrameSize();
    const float dirs[3][2] = {{30.0f, 10.0f}, {-80.0f, -20.0f},
                              {150.0f, 45.0f}};
    int i;
    void* h;
    ambi_enc_create(&h);
    ambi_enc_init(h, 48000);
    ambi_enc_setOutputOrder(h, order);
    ambi_enc_setNormType(h, NORM_N3D);
    ambi_enc_setNumSources(h, nSrc);
    for (i = 0; i < nSrc; i++) {
        ambi_enc_setSourceAzi_deg(h, i, dirs[i][0]);
        ambi_enc_setSourceElev_deg(h, i, dirs[i][1]);
    }
    ambi_enc_setEnablePostScaling(h, 1);

    float** in = (float**)malloc2d(nSrc, nFrames * frame, sizeof(float));
    float** inF = (float**)malloc2d(nSrc, frame, sizeof(float));
    float** outF = (float**)malloc2d(nsh, frame, sizeof(float));
    float* out = malloc1d((size_t)nsh * nFrames * frame * sizeof(float));
    fill_noise(in, nSrc, nFrames * frame);
    RUN_FRAMES(ambi_enc_process, h, in, out, nSrc, nsh, frame, nFrames,
               inF, outF);
    char sh[32];
    snprintf(sh, sizeof(sh), "%d,%d", nSrc, nFrames * frame);
    dump("enc_in", FLATTEN2D(in), (size_t)nSrc * nFrames * frame, "f4", sh);
    snprintf(sh, sizeof(sh), "%d,%d", nsh, nFrames * frame);
    dump("enc_out", out, (size_t)nsh * nFrames * frame, "f4", sh);
    dump("enc_dirs", dirs, 6, "f4", "3,2");
    float meta[1] = {(float)frame};
    dump("enc_frame", meta, 1, "f4", "1");
    ambi_enc_destroy(&h);
    free(in); free(inF); free(outF); free(out);
}

/* -------------------------------------------------------------------- */
static void golden_rotator(void)
{
    const int order = 3, nsh = 16, nFrames = 32;
    const int frame = rotator_getFrameSize();
    void* h;
    rotator_create(&h);
    rotator_init(h, 48000);
    rotator_setOrder(h, order);
    rotator_setNormType(h, NORM_N3D);
    rotator_setYaw(h, 30.0f);
    rotator_setPitch(h, -20.0f);
    rotator_setRoll(h, 10.0f);

    float** in = (float**)malloc2d(nsh, nFrames * frame, sizeof(float));
    float** inF = (float**)malloc2d(nsh, frame, sizeof(float));
    float** outF = (float**)malloc2d(nsh, frame, sizeof(float));
    float* out = malloc1d((size_t)nsh * nFrames * frame * sizeof(float));
    fill_noise(in, nsh, nFrames * frame);
    RUN_FRAMES(rotator_process, h, in, out, nsh, nsh, frame, nFrames,
               inF, outF);
    char sh[32];
    snprintf(sh, sizeof(sh), "%d,%d", nsh, nFrames * frame);
    dump("rot_in", FLATTEN2D(in), (size_t)nsh * nFrames * frame, "f4", sh);
    dump("rot_out", out, (size_t)nsh * nFrames * frame, "f4", sh);
    float meta[1] = {(float)frame};
    dump("rot_frame", meta, 1, "f4", "1");
    rotator_destroy(&h);
    free(in); free(inF); free(outF); free(out);
}

/* -------------------------------------------------------------------- */
static void golden_beamformer(void)
{
    const int order = 3, nsh = 16, nBeams = 2, nFrames = 32;
    const int frame = beamformer_getFrameSize();
    const float bdirs[2][2] = {{20.0f, 15.0f}, {-110.0f, -10.0f}};
    int i;
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
    beamformer_setBeamType(h, STATIC_BEAM_TYPE_MAX_EV);

    float** in = (float**)malloc2d(nsh, nFrames * frame, sizeof(float));
    float** inF = (float**)malloc2d(nsh, frame, sizeof(float));
    float** outF = (float**)malloc2d(nBeams, frame, sizeof(float));
    float* out = malloc1d((size_t)nBeams * nFrames * frame * sizeof(float));
    fill_noise(in, nsh, nFrames * frame);
    RUN_FRAMES(beamformer_process, h, in, out, nsh, nBeams, frame, nFrames,
               inF, outF);
    char sh[32];
    snprintf(sh, sizeof(sh), "%d,%d", nsh, nFrames * frame);
    dump("bf_in", FLATTEN2D(in), (size_t)nsh * nFrames * frame, "f4", sh);
    snprintf(sh, sizeof(sh), "%d,%d", nBeams, nFrames * frame);
    dump("bf_out", out, (size_t)nBeams * nFrames * frame, "f4", sh);
    dump("bf_dirs", bdirs, 4, "f4", "2,2");
    float meta[1] = {(float)frame};
    dump("bf_frame", meta, 1, "f4", "1");
    beamformer_destroy(&h);
    free(in); free(inF); free(outF); free(out);
}

/* -------------------------------------------------------------------- */
static void golden_ambi_dec(void)
{
    /* order 3 → 9-speaker custom layout, ALLRAD both bands, maxrE on,
     * transition 800 Hz */
    const float ls_dirs[9][2] = {
        {0.0f, -3.0f}, {47.0f, 2.0f}, {-42.0f, 1.0f}, {88.0f, -2.0f},
        {-93.0f, 0.0f}, {132.0f, 3.0f}, {-138.0f, -1.0f},
        {30.0f, 40.0f}, {-60.0f, 28.0f}};
    const int order = 3, nsh = 16, nLS = 9, nFrames = 32;
    const int frame = ambi_dec_getFrameSize();
    int i;
    void* h;
    ambi_dec_create(&h);
    ambi_dec_init(h, 48000);
    ambi_dec_setMasterDecOrder(h, order);
    ambi_dec_setDecOrderAllBands(h, order);
    ambi_dec_setNormType(h, NORM_N3D);
    ambi_dec_setNumLoudspeakers(h, nLS);
    for (i = 0; i < nLS; i++) {
        ambi_dec_setLoudspeakerAzi_deg(h, i, ls_dirs[i][0]);
        ambi_dec_setLoudspeakerElev_deg(h, i, ls_dirs[i][1]);
    }
    ambi_dec_setBinauraliseLSflag(h, 0);
    ambi_dec_setDecMethod(h, 0, LOUDSPEAKER_DECODER_ALLRAD);
    ambi_dec_setDecMethod(h, 1, LOUDSPEAKER_DECODER_ALLRAD);
    ambi_dec_setDecEnableMaxrE(h, 0, 0);
    ambi_dec_setDecEnableMaxrE(h, 1, 1);
    ambi_dec_setTransitionFreq(h, 800.0f);
    ambi_dec_initCodec(h);

    float** in = (float**)malloc2d(nsh, nFrames * frame, sizeof(float));
    float** inF = (float**)malloc2d(nsh, frame, sizeof(float));
    float** outF = (float**)malloc2d(nLS, frame, sizeof(float));
    float* out = malloc1d((size_t)nLS * nFrames * frame * sizeof(float));
    fill_noise(in, nsh, nFrames * frame);
    RUN_FRAMES(ambi_dec_process, h, in, out, nsh, nLS, frame, nFrames,
               inF, outF);
    char sh[32];
    snprintf(sh, sizeof(sh), "%d,%d", nsh, nFrames * frame);
    dump("dec_e2e_in", FLATTEN2D(in), (size_t)nsh * nFrames * frame, "f4",
         sh);
    snprintf(sh, sizeof(sh), "%d,%d", nLS, nFrames * frame);
    dump("dec_e2e_out", out, (size_t)nLS * nFrames * frame, "f4", sh);
    dump("dec_e2e_ls_dirs", ls_dirs, 18, "f4", "9,2");
    ambi_dec_destroy(&h);
    free(in); free(inF); free(outF); free(out);
}

/* -------------------------------------------------------------------- */
static void golden_dirass(void)
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
    dirass_setDiRAssMode(h, REASS_UPSCALE);
    dirass_setMinFreq(h, 100.0f);
    dirass_setMaxFreq(h, 8000.0f);
    dirass_setMapAvgCoeff(h, 0.25f);
    dirass_initCodec(h);

    /* two planted sources (order 2) */
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
        dirass_analysis(h, (const float* const*)in, nsh, frame, 1);
    }
    free(Y);
    float* grid_dirs, *pmap;
    int nDirs, pmapWidth, hfov;
    float aspect;
    dirass_getPmap(h, &grid_dirs, &pmap, &nDirs, &pmapWidth, &hfov, &aspect);
    char sh[32];
    snprintf(sh, sizeof(sh), "%d,%d,%d", nFrames, nsh, frame);
    dump("dir_in", in_all, (size_t)nFrames * nsh * frame, "f4", sh);
    snprintf(sh, sizeof(sh), "%d", nDirs);
    dump("dir_pmap", pmap, nDirs, "f4", sh);
    snprintf(sh, sizeof(sh), "%d,2", nDirs);
    dump("dir_grid_dirs", grid_dirs, (size_t)nDirs * 2, "f4", sh);
    float meta[4] = {(float)nDirs, (float)pmapWidth, (float)hfov, aspect};
    dump("dir_meta", meta, 4, "f4", "4");
    dirass_destroy(&h);
    free(in); free(in_all);
}

/* -------------------------------------------------------------------- */
static void golden_roombinauraliser(void)
{
    const int nSrc = 2, nFrames = 48;
    const int frame = roombinauraliser_getFrameSize();
    const float sdirs[2][2] = {{40.0f, 10.0f}, {-70.0f, -5.0f}};
    int i;
    void* h;
    roombinauraliser_create(&h);
    roombinauraliser_init(h, 48000);
    roombinauraliser_setNumSources(h, nSrc);
    for (i = 0; i < nSrc; i++) {
        roombinauraliser_setSourceAzi_deg(h, i, sdirs[i][0]);
        roombinauraliser_setSourceElev_deg(h, i, sdirs[i][1]);
    }
    roombinauraliser_setUseDefaultHRIRsflag(h, 1);
    roombinauraliser_setEnableRotation(h, 0);
    /* NOTE (fork bug): calling the diffuse-EQ setters before the FIRST
     * full initCodec downgrades reInitHRTFsAndGainTables to REINIT_DEQ and
     * initCodec then dereferences never-loaded HRIR buffers → segfault.
     * Full init first, then set the EQ mode and re-init (REINIT_DEQ). */
    roombinauraliser_initCodec(h);
    roombinauraliser_setEnableHRIRsDiffuseEQ(h, 1);
    roombinauraliser_setDiffuseEqMode(h, DIFF_EQ_FABIAN_CTF);
    roombinauraliser_initCodec(h);

    float** in = (float**)malloc2d(nSrc, nFrames * frame, sizeof(float));
    float** inF = (float**)malloc2d(nSrc, frame, sizeof(float));
    float** outF = (float**)malloc2d(2, frame, sizeof(float));
    float* out = malloc1d((size_t)2 * nFrames * frame * sizeof(float));
    fill_noise(in, nSrc, nFrames * frame);
    RUN_FRAMES(roombinauraliser_process, h, in, out, nSrc, 2, frame,
               nFrames, inF, outF);
    char sh[32];
    snprintf(sh, sizeof(sh), "%d,%d", nSrc, nFrames * frame);
    dump("rb_in", FLATTEN2D(in), (size_t)nSrc * nFrames * frame, "f4", sh);
    snprintf(sh, sizeof(sh), "2,%d", nFrames * frame);
    dump("rb_out", out, (size_t)2 * nFrames * frame, "f4", sh);
    dump("rb_src_dirs", sdirs, 4, "f4", "2,2");
    float meta[1] = {(float)frame};
    dump("rb_frame", meta, 1, "f4", "1");
    roombinauraliser_destroy(&h);
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

    golden_ambi_enc();
    printf("ambi_enc goldens done\n");
    golden_rotator();
    printf("rotator goldens done\n");
    golden_beamformer();
    printf("beamformer goldens done\n");
    golden_ambi_dec();
    printf("ambi_dec goldens done\n");
    golden_dirass();
    printf("dirass goldens done\n");
    golden_roombinauraliser();
    printf("roombinauraliser goldens done\n");

    fclose(manifest);
    return 0;
}
