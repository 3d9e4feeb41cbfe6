/* Golden-fixture generator, part 2: VBAP, matrixConv, QMF, IMS shoebox
 * reverb and the binauraliser example — run by run_goldens.sh AFTER
 * gen_goldens (appends to the same manifest; pack_goldens.py bundles all).
 *
 * Recipes follow the reference's own tests/usage:
 *   - VBAP gain table: test/src/test__vbap_module.c usage of
 *     generateVBAPgainTable3D (saf_vbap.h:129)
 *   - matrixConv: test__utilities_module.c:403 reconstruction recipe
 *   - QMF: test__utilities_module.c qmf round-trip
 *   - IMS shoebox: saf_reverb.h:105-148 order-limited echograms + RIRs
 *   - binauraliser: test__examples.c style block processing
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

#include "saf.h"
#include "saf_reverb_internal.h"
#include "binauraliser.h"

#define HOPSIZE 128

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

/* deterministic noise, same LCG as gen_goldens.c (fresh stream per golden) */
static unsigned int lcg_state = 1234567u;
static float lcg_noise(void)
{
    lcg_state = lcg_state * 1664525u + 1013904223u;
    return (float)(lcg_state >> 8) / 8388608.0f - 1.0f;
}

/* -------------------------------------------------------------------- */
static void golden_vbap(void)
{
    /* generic-position layout (no coplanar hull quads — a symmetric ±45/±135
     * + symmetric-heights layout has an exactly coplanar rear-top quad whose
     * triangulation diagonal is ambiguous between qhull and convhull_3d) */
    float ls_dirs[9][2] = {
        {0.0f, -3.0f}, {47.0f, 2.0f}, {-42.0f, 1.0f}, {88.0f, -2.0f},
        {-93.0f, 0.0f}, {132.0f, 3.0f}, {-138.0f, -1.0f},
        {30.0f, 40.0f}, {-60.0f, 28.0f}};
    float* gtable = NULL;
    int N_gtable = 0, nTriangles = 0;
    generateVBAPgainTable3D((float*)ls_dirs, 9, 15, 15, 0, 0, 0.0f,
                            &gtable, &N_gtable, &nTriangles);
    char shape[64];
    snprintf(shape, sizeof(shape), "%d,9", N_gtable);
    dump("vbap_ls_dirs", (float*)ls_dirs, 18, "f4", "9,2");
    dump("vbap_gtable_15deg", gtable, (size_t)N_gtable * 9, "f4", shape);
    float meta[2] = {(float)N_gtable, (float)nTriangles};
    dump("vbap_meta", meta, 2, "f4", "2");
    free(gtable);

    /* with spread (MDAP) */
    float* gtable_sp = NULL;
    generateVBAPgainTable3D((float*)ls_dirs, 9, 15, 15, 0, 0, 30.0f,
                            &gtable_sp, &N_gtable, &nTriangles);
    dump("vbap_gtable_15deg_spread30", gtable_sp, (size_t)N_gtable * 9, "f4",
         shape);
    free(gtable_sp);
}

/* -------------------------------------------------------------------- */
static void golden_matrixconv(void)
{
    const int nin = 2, nout = 3, lh = 1024, nblocks = 8;
    int i, b;
    float* H = malloc1d(nout * nin * lh * sizeof(float));
    for (i = 0; i < nout * nin * lh; i++)
        H[i] = 0.1f * lcg_noise();
    for (i = 0; i < nout * nin; i++)
        H[i * lh] += 1.0f;                      /* leading impulse */
    float* in = malloc1d(nin * nblocks * HOPSIZE * sizeof(float));
    for (i = 0; i < nin * nblocks * HOPSIZE; i++)
        in[i] = lcg_noise();

    for (int part = 0; part <= 1; part++) {
        void* h;
        saf_matrixConv_create(&h, HOPSIZE, H, lh, nin, nout, part);
        float* out = malloc1d(nout * nblocks * HOPSIZE * sizeof(float));
        float* inblk = malloc1d(nin * HOPSIZE * sizeof(float));
        float* outblk = malloc1d(nout * HOPSIZE * sizeof(float));
        for (b = 0; b < nblocks; b++) {
            for (i = 0; i < nin; i++)
                memcpy(&inblk[i * HOPSIZE],
                       &in[i * nblocks * HOPSIZE + b * HOPSIZE],
                       HOPSIZE * sizeof(float));
            saf_matrixConv_apply(h, inblk, outblk);
            for (i = 0; i < nout; i++)
                memcpy(&out[i * nblocks * HOPSIZE + b * HOPSIZE],
                       &outblk[i * HOPSIZE], HOPSIZE * sizeof(float));
        }
        dump(part ? "mc_out_part" : "mc_out_nonpart", out,
             (size_t)nout * nblocks * HOPSIZE, "f4", "3,1024");
        saf_matrixConv_destroy(&h);
        free(out); free(inblk); free(outblk);
    }
    dump("mc_H", H, (size_t)nout * nin * lh, "f4", "3,2,1024");
    dump("mc_in", in, (size_t)nin * nblocks * HOPSIZE, "f4", "2,1024");
    free(H); free(in);
}

/* -------------------------------------------------------------------- */
static void golden_qmf(void)
{
    const int nCH = 4, framesize = 512, nFrames = 8;
    const int nHops = framesize / HOPSIZE;
    const int sigLen = nFrames * framesize;
    int frame, ch, i;
    void* h;
    float** insig = (float**)malloc2d(nCH, sigLen, sizeof(float));
    float** outsig = (float**)malloc2d(nCH, sigLen, sizeof(float));
    float** inframe = (float**)malloc2d(nCH, framesize, sizeof(float));
    float** outframe = (float**)malloc2d(nCH, framesize, sizeof(float));
    for (ch = 0; ch < nCH; ch++)
        for (i = 0; i < sigLen; i++)
            insig[ch][i] = lcg_noise();

    qmf_create(&h, nCH, nCH, HOPSIZE, 1, QMF_BANDS_CH_TIME);
    int nBands = qmf_getNBands(h);
    float pd = (float)qmf_getProcDelay(h);
    float_complex*** spec =
        (float_complex***)malloc3d(nBands, nCH, nHops, sizeof(float_complex));
    float_complex* allspec =
        malloc1d((size_t)nFrames * nBands * nCH * nHops
                 * sizeof(float_complex));
    for (frame = 0; frame < nFrames; frame++) {
        for (ch = 0; ch < nCH; ch++)
            memcpy(inframe[ch], &insig[ch][frame * framesize],
                   framesize * sizeof(float));
        qmf_analysis(h, inframe, framesize, spec);
        memcpy(&allspec[(size_t)frame * nBands * nCH * nHops],
               FLATTEN3D(spec),
               (size_t)nBands * nCH * nHops * sizeof(float_complex));
        qmf_synthesis(h, spec, framesize, outframe);
        for (ch = 0; ch < nCH; ch++)
            memcpy(&outsig[ch][frame * framesize], outframe[ch],
                   framesize * sizeof(float));
    }
    char shape[64];
    snprintf(shape, sizeof(shape), "%d,%d,%d,%d", nFrames, nBands, nCH, nHops);
    dump("qmf_in", FLATTEN2D(insig), (size_t)nCH * sigLen, "f4", "4,4096");
    dump("qmf_spec", allspec, (size_t)nFrames * nBands * nCH * nHops, "c8",
         shape);
    dump("qmf_out", FLATTEN2D(outsig), (size_t)nCH * sigLen, "f4", "4,4096");
    dump("qmf_proc_delay", &pd, 1, "f4", "1");
    qmf_destroy(&h);
    free(insig); free(outsig); free(inframe); free(outframe);
    free(spec); free(allspec);
}

/* -------------------------------------------------------------------- */
static void golden_ims_rir(void)
{
    /* order-limited (maxN=3) image sources; 4 octave bands; SH order-1
     * receiver; RIR rendered without fractional delays */
    float room[3] = {10.0f, 7.0f, 4.0f};
    float abs_wall[4 * 6];
    int band, w;
    const float base[4] = {0.30f, 0.24f, 0.12f, 0.06f};
    for (band = 0; band < 4; band++)
        for (w = 0; w < 6; w++)
            abs_wall[band * 6 + w] = base[band] + 0.02f * w;
    void* h;
    ims_shoebox_create(&h, room, abs_wall, 250.0f, 4, 343.0f, 48000.0f);
    float src_pos[3] = {6.2f, 5.1f, 1.2f};
    float rec_pos[3] = {2.1f, 3.3f, 1.6f};
    int sid = ims_shoebox_addSource(h, src_pos, NULL);
    int rid = ims_shoebox_addReceiverSH(h, 1, rec_pos, NULL);
    ims_shoebox_computeEchograms(h, 3, -1.0f);
    ims_shoebox_renderRIRs(h, 0);
    ims_scene_data* sc = (ims_scene_data*)h;
    ims_rir* rir = &sc->rirs[rid][sid];
    char shape[64];
    snprintf(shape, sizeof(shape), "%d,%d", rir->nChannels, rir->length);
    dump("ims_rir_o3_sh1", rir->data,
         (size_t)rir->nChannels * rir->length, "f4", shape);
    float meta[4] = {(float)rir->length, (float)rir->nChannels, 3.0f, 0.0f};
    dump("ims_meta", meta, 4, "f4", "4");
    ims_shoebox_destroy(&h);
}

/* -------------------------------------------------------------------- */
static void golden_binauraliser_e2e(void)
{
    const int fs = 48000, nSrc = 2;
    int i, ch, frame;
    void* h;
    binauraliser_create(&h);
    binauraliser_init(h, fs);
    binauraliser_setNumSources(h, nSrc);
    binauraliser_setSourceAzi_deg(h, 0, 30.0f);
    binauraliser_setSourceElev_deg(h, 0, 0.0f);
    binauraliser_setSourceAzi_deg(h, 1, -45.0f);
    binauraliser_setSourceElev_deg(h, 1, 10.0f);
    binauraliser_initCodec(h);

    const int framesize = binauraliser_getFrameSize();
    const int nFrames = 64;
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
    dump("binaur_in", FLATTEN2D(inSig), (size_t)nSrc * sigLen, "f4", shape);
    snprintf(shape, sizeof(shape), "%d,%d", NUM_EARS, sigLen);
    dump("binaur_out", FLATTEN2D(binSig), (size_t)NUM_EARS * sigLen, "f4",
         shape);
    float fsz = (float)framesize;
    dump("binaur_frame_size", &fsz, 1, "f4", "1");
    binauraliser_destroy(&h);
    free(inSig); free(binSig); free(inFr); free(outFr);
}

/* -------------------------------------------------------------------- */
int main(int argc, char** argv)
{
    if (argc != 2) { fprintf(stderr, "usage: %s <outdir>\n", argv[0]); return 1; }
    outdir = argv[1];
    char mpath[512];
    snprintf(mpath, sizeof(mpath), "%s/manifest.txt", outdir);
    manifest = fopen(mpath, "a");      /* append after gen_goldens */
    if (!manifest) { perror(mpath); return 1; }

    golden_vbap();
    printf("vbap goldens done\n");
    golden_matrixconv();
    printf("matrixconv goldens done\n");
    golden_qmf();
    printf("qmf goldens done\n");
    golden_ims_rir();
    printf("ims goldens done\n");
    golden_binauraliser_e2e();
    printf("binauraliser e2e goldens done\n");

    fclose(manifest);
    return 0;
}
