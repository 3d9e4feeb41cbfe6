/* Golden-fixture generator, part 14: the FORK's roombinauraliser with
 * head rotation engaged — its BRIR lookup rotates the fixed reference
 * frame [1,0,0] by Rzyx (row convention, roombinauraliser.c:235-250) and
 * interpolates ALL sources' BRIRs at that single lookup direction.
 * Separate from part 13 because roombinauraliser.h and binauraliser.h
 * both declare the INTERP_* enum.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

#include "saf.h"
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

static unsigned int lcg_state = 99191u;
static float lcg_noise(void)
{
    lcg_state = lcg_state * 1664525u + 1013904223u;
    return (float)(lcg_state >> 8) / 8388608.0f - 1.0f;
}

/* -------------------------------------------------------------------- */
static void golden_roombinauraliser_rotation(void)
{
    const int nSrc = 2, nFrames = 48;
    const int frame = roombinauraliser_getFrameSize();
    const float sdirs[2][2] = {{30.0f, 0.0f}, {-45.0f, 10.0f}};
    int i, f, ch;
    void* h;
    roombinauraliser_create(&h);
    roombinauraliser_init(h, 48000);
    roombinauraliser_setNumSources(h, nSrc);
    for (i = 0; i < nSrc; i++) {
        roombinauraliser_setSourceAzi_deg(h, i, sdirs[i][0]);
        roombinauraliser_setSourceElev_deg(h, i, sdirs[i][1]);
    }
    roombinauraliser_setUseDefaultHRIRsflag(h, 1);
    roombinauraliser_setEnableRotation(h, 1);
    roombinauraliser_setYaw(h, 40.0f);
    roombinauraliser_setPitch(h, -15.0f);
    roombinauraliser_setRoll(h, 10.0f);
    /* fork bug (C_PARITY #3): diffuse-EQ setters before the FIRST full
     * initCodec segfault; full init first, then set + re-init */
    roombinauraliser_initCodec(h);
    roombinauraliser_setEnableHRIRsDiffuseEQ(h, 1);
    roombinauraliser_setDiffuseEqMode(h, DIFF_EQ_FABIAN_CTF);
    roombinauraliser_initCodec(h);

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
        roombinauraliser_process(h, (const float* const*)inF, outF, nSrc, 2,
                                 frame);
        for (ch = 0; ch < 2; ch++)
            memcpy(&out[(size_t)ch * nFrames * frame + f * frame], outF[ch],
                   frame * sizeof(float));
    }
    char sh[32];
    snprintf(sh, sizeof(sh), "%d,%d", nSrc, nFrames * frame);
    dump("rbr_in", FLATTEN2D(in), (size_t)nSrc * nFrames * frame, "f4", sh);
    snprintf(sh, sizeof(sh), "2,%d", nFrames * frame);
    dump("rbr_out", out, (size_t)2 * nFrames * frame, "f4", sh);
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

    golden_roombinauraliser_rotation();
    printf("roombinauraliser(rotation) goldens done\n");

    fclose(manifest);
    return 0;
}
