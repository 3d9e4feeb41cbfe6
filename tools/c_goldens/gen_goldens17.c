/* Golden-fixture generator, part 17: resampleHRIRs (saf_hrir.c:365-465) —
 * the speex resampler path (QUALITY_MAX, skip_zeros, zero-fed tail until
 * the output buffer is full).  Covers both speex kernel modes:
 *   - interpolated sinc table (48000<->44100, den_rate too large for the
 *     direct table) in both directions,
 *   - direct sinc table (48000->96000 up, 96000->48000 down),
 *   - the heavy-downsampling oversample>>=1 branch (48000->16000),
 *   - padToNextPow2 (the "pad" region carries real filter tail, not zeros).
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "saf.h"

static FILE* manifest;
static const char* outdir;

static void dump(const char* name, const void* data, size_t n_elem,
                 const char* dtype, const char* shape)
{
    char path[512];
    size_t esz = strcmp(dtype, "c8") == 0 ? 8 : 4;
    FILE* f;
    snprintf(path, sizeof(path), "%s/%s.bin", outdir, name);
    f = fopen(path, "wb");
    if (!f) { perror(path); exit(1); }
    fwrite(data, esz, n_elem, f);
    fclose(f);
    fprintf(manifest, "%s %s %s\n", name, dtype, shape);
}

static unsigned int lcg_state = 171717u;
static float lcg_noise(void)
{
    lcg_state = lcg_state * 1664525u + 1013904223u;
    return (float)(lcg_state >> 8) / 8388608.0f - 1.0f;
}

#define N_DIRS 4
#define IN_LEN 256

static void one_case(const char* tag, float* hrirs_in, int in_fs, int out_fs,
                     int pad)
{
    float* out = NULL;
    int out_len = 0;
    char name[128];
    char shape[64];
    resampleHRIRs(hrirs_in, N_DIRS, IN_LEN, in_fs, out_fs, pad,
                  &out, &out_len);
    snprintf(name, sizeof(name), "rsmp_%s_out", tag);
    snprintf(shape, sizeof(shape), "%d,%d,%d", N_DIRS, 2, out_len);
    dump(name, out, (size_t)N_DIRS * 2 * out_len, "f4", shape);
    free(out);
}

int main(int argc, char** argv)
{
    float* hrirs_in;
    int i;
    if (argc != 2) { fprintf(stderr, "usage: %s <outdir>\n", argv[0]); return 1; }
    setbuf(stdout, NULL);
    outdir = argv[1];
    char mpath[512];
    snprintf(mpath, sizeof(mpath), "%s/manifest.txt", outdir);
    manifest = fopen(mpath, "a");
    if (!manifest) { perror(mpath); return 1; }

    hrirs_in = malloc1d(N_DIRS * 2 * IN_LEN * sizeof(float));
    for (i = 0; i < N_DIRS * 2 * IN_LEN; i++)
        hrirs_in[i] = lcg_noise();
    dump("rsmp_in", hrirs_in, N_DIRS * 2 * IN_LEN, "f4", "4,2,256");

    one_case("48k_44k", hrirs_in, 48000, 44100, 0);   /* interp, down */
    one_case("44k_48k", hrirs_in, 44100, 48000, 0);   /* interp, up   */
    one_case("48k_96k_pad", hrirs_in, 48000, 96000, 1); /* direct, up, pow2 */
    one_case("96k_48k", hrirs_in, 96000, 48000, 0);   /* direct, down */
    one_case("48k_16k", hrirs_in, 48000, 16000, 0);   /* oversample>>1 */

    free(hrirs_in);
    printf("resampleHRIRs goldens done\n");
    fclose(manifest);
    return 0;
}
