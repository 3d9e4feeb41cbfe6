/* Golden-fixture generator, part 10: convhull_3d triangulations.
 *
 * Dumps the exact findLsTriplets face lists (convhull_3d quickhull with
 * unseeded-rand() jitter) for three grids, called back-to-back in ONE
 * process so the rand() stream position carries over — the Python
 * reimplementation (utils/convhull3d.py) must reproduce both the hull
 * decisions and the stream continuation.  This generator must be run as
 * its own process (rand() starts at glibc seed-1 position 0) and
 * golden_hulls() must stay the first rand() consumer.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

#include "saf.h"

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

static void dump_hull(const char* tag, float* dirs_deg, int L)
{
    float* verts = NULL;
    int* faces = NULL;
    int nVerts = 0, nFaces = 0;
    char name[64], sh[32];
    findLsTriplets(dirs_deg, L, 0, &verts, &nVerts, &faces, &nFaces);
    snprintf(name, sizeof(name), "vbh_%s_dirs", tag);
    snprintf(sh, sizeof(sh), "%d,2", L);
    dump(name, dirs_deg, (size_t)L * 2, "f4", sh);
    snprintf(name, sizeof(name), "vbh_%s_verts", tag);
    snprintf(sh, sizeof(sh), "%d,3", nVerts);
    dump(name, verts, (size_t)nVerts * 3, "f4", sh);
    snprintf(name, sizeof(name), "vbh_%s_faces", tag);
    snprintf(sh, sizeof(sh), "%d,3", nFaces);
    dump(name, faces, (size_t)nFaces * 3, "i4", sh);
    free(verts);
    free(faces);
}

static void golden_hulls(void)
{
    int i, j, L;

    /* 1) the default HRIR measurement grid (what binauraliser INTERP_TRI
     *    and binauraliser_nf triangulate) — rand() position 0 */
    dump_hull("hrir836", (float*)__default_hrir_dirs_deg, 836);

    /* 2) a fully regular az×el grid: worst case for coplanar quads */
    {
        float dirs[12 * 5][2];
        for (i = 0, L = 0; i < 12; i++)
            for (j = 0; j < 5; j++, L++) {
                dirs[L][0] = -180.0f + 30.0f * (float)i;
                dirs[L][1] = -60.0f + 30.0f * (float)j;
            }
        dump_hull("grid60", (float*)dirs, L);
    }

    /* 3) the t-design-9 grid (48 dirs) */
    dump_hull("tdes48", (float*)__Tdesign_degree_9_dirs_deg, 48);
}

int main(int argc, char** argv)
{
    if (argc != 2) { fprintf(stderr, "usage: %s <outdir>\n", argv[0]); return 1; }
    setbuf(stdout, NULL);
    outdir = argv[1];
    char mpath[512];
    snprintf(mpath, sizeof(mpath), "%s/manifest.txt", outdir);
    manifest = fopen(mpath, "a");
    if (!manifest) { perror(mpath); return 1; }

    golden_hulls();
    printf("convhull goldens done\n");

    fclose(manifest);
    return 0;
}
