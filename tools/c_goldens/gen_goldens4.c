/* Golden-fixture generator, part 4: SH beam weights + sector coefficients,
 * the saf_sh array-processing suite (modal coefficients, scatterers, diffuse
 * coherence, array simulation, SHT-filter evaluation, noise thresholds), and
 * the saf_tracker numerical core (lti_disc/kf_predict6/kf_update6/gamma_cdf)
 * plus a near-deterministic end-to-end tracker3d trajectory.
 *
 * rand() is overridden below with a fixed LCG so the tracker's Monte-Carlo
 * draws are reproducible run-to-run (the scenario is chosen so the tracked
 * output is insensitive to the draws; see test_c_goldens.py).
 *
 * Recipes mirror test__sh_module.c (sector/beamformer tests),
 * test__utilities_module.c and test__tracker3d (saf_test.h) with
 * deterministic inputs.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

#include "saf.h"
#include "saf_tracker_internal.h"

/* deterministic LCG stand-in for libc rand() (RAND_MAX = 2^31-1 here too) */
static unsigned long long lcg_rand_state = 20260816ull;
int rand(void)
{
    lcg_rand_state = lcg_rand_state * 6364136223846793005ull
        + 1442695040888963407ull;
    return (int)((lcg_rand_state >> 33) & 0x7fffffff);
}

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

/* -------------------------------------------------------------------- */
static void golden_beamweights(void)
{
    /* axisymmetric beam weights, orders 1..4, zero-padded to 5 */
    float card[4][5], hyper[4][5], maxev[4][5];
    int n;
    memset(card, 0, sizeof(card));
    memset(hyper, 0, sizeof(hyper));
    memset(maxev, 0, sizeof(maxev));
    for (n = 1; n <= 4; n++) {
        beamWeightsCardioid2Spherical(n, card[n - 1]);
        beamWeightsHypercardioid2Spherical(n, hyper[n - 1]);
        beamWeightsMaxEV(n, maxev[n - 1]);
    }
    dump("bw_cardioid", card, 20, "f4", "4,5");
    dump("bw_hypercardioid", hyper, 20, "f4", "4,5");
    dump("bw_maxev", maxev, 20, "f4", "4,5");

    /* rotated axisymmetric pattern (order 3 hypercardioid) */
    float c_nm[16];
    rotateAxisCoeffsReal(3, hyper[2], 1.1f, -0.6f, c_nm);
    dump("bw_rot_cnm_o3", c_nm, 16, "f4", "16");
}

/* -------------------------------------------------------------------- */
static void golden_sector_coeffs(void)
{
    const int orderSec = 2;
    const int nA = 16 * 9 * 3;              /* (o+2)^2 x (o+1)^2 x 3 */
    float_complex* A_xyz = malloc1d(nA * sizeof(float_complex));
    computeVelCoeffsMtx(orderSec, A_xyz);
    dump("sec_A_xyz_o2", A_xyz, nA, "c8", "16,9,3");

    float sec_dirs[6][2] = {
        {0.0f, 90.0f}, {0.0f, -90.0f}, {0.0f, 0.0f},
        {90.0f, 0.0f}, {180.0f, 0.0f}, {-90.0f, 0.0f}};
    float* secEP = malloc1d(6 * 4 * 16 * sizeof(float));
    float* secAP = malloc1d(6 * 4 * 16 * sizeof(float));
    float nEP = computeSectorCoeffsEP(orderSec, A_xyz, SECTOR_PATTERN_PWD,
                                      (float*)sec_dirs, 6, secEP);
    float nAP = computeSectorCoeffsAP(orderSec, A_xyz, SECTOR_PATTERN_PWD,
                                      (float*)sec_dirs, 6, secAP);
    dump("sec_dirs_deg", sec_dirs, 12, "f4", "6,2");
    dump("sec_coeffs_ep_o2", secEP, 6 * 4 * 16, "f4", "24,16");
    dump("sec_coeffs_ap_o2", secAP, 6 * 4 * 16, "f4", "24,16");
    float norms[2] = {nEP, nAP};
    dump("sec_norms", norms, 2, "f4", "2");
    free(A_xyz); free(secEP); free(secAP);
}

/* -------------------------------------------------------------------- */
static void golden_array_proc(void)
{
    const int order = 3, nsh = 16, nb = 12, nsens = 16;
    double kr[12], kR[12];
    int b, i, j;
    for (b = 0; b < nb; b++) {
        kr[b] = 0.1 * exp((double)b * log(60.0) / 11.0);
        kR[b] = 0.8 * kr[b];
    }
    {
        float krf[12];
        for (b = 0; b < nb; b++) krf[b] = (float)kr[b];
        dump("ap_kr", krf, nb, "f4", "12");
    }

    /* deterministic 16-sensor layout: 2 rings + poles */
    float sens_rad[16][2];
    for (i = 0; i < 7; i++) {
        sens_rad[i][0] = (float)(2.0 * M_PI * i / 7.0 - M_PI);
        sens_rad[i][1] = 0.6f;
        sens_rad[i + 7][0] = (float)(2.0 * M_PI * i / 7.0 - M_PI + 0.2);
        sens_rad[i + 7][1] = -0.55f;
    }
    sens_rad[14][0] = 0.3f; sens_rad[14][1] = (float)(M_PI / 2);
    sens_rad[15][0] = -0.7f; sens_rad[15][1] = (float)(-M_PI / 2);
    dump("ap_sensor_dirs_rad", sens_rad, 32, "f4", "16,2");

    double_complex* bN = malloc1d(nb * (order + 1) * sizeof(double_complex));
    sphModalCoeffs(order, kr, nb, ARRAY_CONSTRUCTION_RIGID, 1.0, bN);
    dump("ap_modal_rigid", bN, nb * (order + 1), "c16", "12,4");
    sphModalCoeffs(order, kr, nb, ARRAY_CONSTRUCTION_OPEN, 1.0, bN);
    dump("ap_modal_open", bN, nb * (order + 1), "c16", "12,4");
    sphModalCoeffs(order, kr, nb, ARRAY_CONSTRUCTION_OPEN_DIRECTIONAL, 0.5,
                   bN);
    dump("ap_modal_open_card", bN, nb * (order + 1), "c16", "12,4");
    sphScattererModalCoeffs(order, kr, kR, nb, bN);
    dump("ap_modal_scatterer", bN, nb * (order + 1), "c16", "12,4");
    sphScattererDirModalCoeffs(order, kr, kR, nb, 0.5, bN);
    dump("ap_modal_scatterer_dir", bN, nb * (order + 1), "c16", "12,4");
    free(bN);

    double* Mdc = malloc1d(nsens * nsens * nb * sizeof(double));
    sphDiffCohMtxTheory(order, (float*)sens_rad, nsens,
                        ARRAY_CONSTRUCTION_RIGID, 1.0, kr, nb, Mdc);
    dump("ap_diffcoh_rigid", Mdc, (size_t)nsens * nsens * nb, "f8",
         "16,16,12");
    free(Mdc);

    float f_lim[4];
    sphArrayNoiseThreshold(order, nsens, 0.042f, 343.0f,
                           ARRAY_CONSTRUCTION_RIGID, 1.0, 40.0f, f_lim);
    dump("ap_noise_flim", f_lim, 3, "f4", "3");
    float alias = sphArrayAliasLim(0.042f, 343.0f, order);
    dump("ap_alias_lim", &alias, 1, "f4", "1");

    /* simulated array response for grid dirs + SHT filter evaluation */
    const int ndirs = 240;
    float* grid_deg = (float*)__Tdesign_degree_21_dirs_deg;
    float_complex* H = malloc1d((size_t)nb * nsens * ndirs
                                * sizeof(float_complex));
    simulateSphArray(order, kr, kR, nb, (float*)sens_rad, nsens, grid_deg,
                     ndirs, ARRAY_CONSTRUCTION_RIGID, 1.0, H);
    dump("ap_H_array", H, (size_t)nb * nsens * ndirs, "c8", "12,16,240");

    /* complex SH on the grid (ndirs x nsh) */
    float* grid_rad = malloc1d(ndirs * 2 * sizeof(float));
    for (i = 0; i < ndirs; i++) {
        grid_rad[2 * i] = grid_deg[2 * i] * (float)M_PI / 180.0f;
        grid_rad[2 * i + 1] = grid_deg[2 * i + 1] * (float)M_PI / 180.0f;
    }
    float_complex* Yc = malloc1d((size_t)nsh * ndirs * sizeof(float_complex));
    getSHcomplex(order, grid_rad, ndirs, Yc);     /* (nsh, ndirs) */
    float_complex* Ygrid = malloc1d((size_t)ndirs * nsh
                                    * sizeof(float_complex));
    for (i = 0; i < ndirs; i++)
        for (j = 0; j < nsh; j++)
            Ygrid[i * nsh + j] = Yc[j * ndirs + i];
    /* NOTE: evaluateSHTfilters's doc claims Y_grid is (nDirs, nSH) but the
     * code indexes Y_grid[q*nDirs+i], i.e. (nSH, nDirs) — pass Yc. */
    dump("ap_Ygrid_cmplx", Yc, (size_t)nsh * ndirs, "c8", "16,240");

    /* fixed encoding matrix: M[b] = (1/ndirs) * Ygrid^H * H[b]^H */
    float_complex* M = malloc1d((size_t)nb * nsh * nsens
                                * sizeof(float_complex));
    const float_complex calpha = cmplxf(1.0f / (float)ndirs, 0.0f);
    const float_complex cbeta = cmplxf(0.0f, 0.0f);
    for (b = 0; b < nb; b++)
        cblas_cgemm(CblasRowMajor, CblasConjTrans, CblasConjTrans,
                    nsh, nsens, ndirs, &calpha,
                    Ygrid, nsh,
                    &H[(size_t)b * nsens * ndirs], ndirs, &cbeta,
                    &M[(size_t)b * nsh * nsens], nsens);
    dump("ap_M_sht", M, (size_t)nb * nsh * nsens, "c8", "12,16,16");

    float* cSH = malloc1d(nb * (order + 1) * sizeof(float));
    float* lSH = malloc1d(nb * (order + 1) * sizeof(float));
    evaluateSHTfilters(order, M, nsens, nb, H, ndirs, Yc, cSH, lSH);
    dump("ap_eval_csh", cSH, nb * (order + 1), "f4", "12,4");
    dump("ap_eval_lsh", lSH, nb * (order + 1), "f4", "12,4");

    free(H); free(grid_rad); free(Yc); free(Ygrid); free(M);
    free(cSH); free(lSH);
}

/* -------------------------------------------------------------------- */
static void golden_tracker_core(void)
{
    int i, j;
    /* lti_disc: 6-D constant-velocity model, L = [0;I], Qc = q I3 */
    float F[6][6], L[6][3], Qc[3][3], A[6][6], Q[6][6];
    memset(F, 0, sizeof(F)); memset(L, 0, sizeof(L));
    memset(Qc, 0, sizeof(Qc));
    for (i = 0; i < 3; i++) {
        F[i][i + 3] = 1.0f;
        L[i + 3][i] = 1.0f;
        Qc[i][i] = 0.7f;
    }
    lti_disc((float*)F, 6, 3, (float*)L, (float*)Qc, 0.125f,
             (float*)A, (float*)Q);
    dump("trk_ltidisc_A", A, 36, "f4", "6,6");
    dump("trk_ltidisc_Q", Q, 36, "f4", "6,6");

    /* kf_predict6 + kf_update6 on a deterministic state */
    float M[6], P[6][6];
    for (i = 0; i < 6; i++) M[i] = 0.1f * (float)(i + 1);
    memset(P, 0, sizeof(P));
    for (i = 0; i < 6; i++) {
        P[i][i] = 0.5f + 0.05f * (float)i;
        for (j = 0; j < 6; j++)
            if (i != j) P[i][j] = 0.02f * (float)(i + j) * (i < j ? 1 : 1);
    }
    /* symmetrise explicitly */
    for (i = 0; i < 6; i++)
        for (j = 0; j < i; j++) P[i][j] = P[j][i];
    dump("trk_kf_M0", M, 6, "f4", "6");
    dump("trk_kf_P0", P, 36, "f4", "6,6");
    kf_predict6(M, P, A, Q);
    dump("trk_kf_Mpred", M, 6, "f4", "6");
    dump("trk_kf_Ppred", P, 36, "f4", "6,6");

    float H[3][6], R[3][3], y[3], Mout[6], Pout[6][6], LH;
    memset(H, 0, sizeof(H)); memset(R, 0, sizeof(R));
    for (i = 0; i < 3; i++) {
        H[i][i] = 1.0f;
        R[i][i] = 0.04f;
    }
    y[0] = 0.25f; y[1] = 0.1f; y[2] = 0.45f;
    void* hUp6;
    kf_update6_create(&hUp6);
    kf_update6(hUp6, M, P, y, H, R, Mout, Pout, &LH);
    kf_update6_destroy(&hUp6);
    dump("trk_kf_Mupd", Mout, 6, "f4", "6");
    dump("trk_kf_Pupd", Pout, 36, "f4", "6,6");
    dump("trk_kf_LH", &LH, 1, "f4", "1");

    float gx[5] = {0.1f, 0.5f, 1.0f, 2.5f, 6.0f};
    float gc[5];
    for (i = 0; i < 5; i++)
        gc[i] = gamma_cdf(gx[i], 2.0f, 0.8f, 0.0f);
    dump("trk_gamma_x", gx, 5, "f4", "5");
    dump("trk_gamma_cdf", gc, 5, "f4", "5");
}

/* -------------------------------------------------------------------- */
static void golden_tracker_e2e(void)
{
    /* one slowly-moving source on the unit sphere; scenario chosen so the
     * Monte-Carlo draws are immaterial (clutter prob ~1e-5, death prob ~0) */
    tracker3d_config tpars;
    int i, step;
    memset(&tpars, 0, sizeof(tpars));
    tpars.Np = 20;
    tpars.ARE_UNIT_VECTORS = 1;
    tpars.maxNactiveTargets = 4;
    tpars.noiseLikelihood = 0.005f;
    tpars.measNoiseSD = 0.15f;
    tpars.noiseSpecDen = 0.001f;
    tpars.ALLOW_MULTI_DEATH = 1;
    tpars.init_birth = 0.5f;
    tpars.alpha_death = 200.0f;
    tpars.beta_death = 1.0f;
    tpars.dt = 0.05f;
    tpars.W_avg_coeff = 0.5f;
    tpars.FORCE_KILL_TARGETS = 0;
    tpars.forceKillDistance = 0.2f;
    for (i = 0; i < 6; i++) tpars.M0[i] = 0.0f;
    memset(tpars.P0, 0, sizeof(tpars.P0));
    for (i = 0; i < 3; i++) {
        tpars.P0[i][i] = 1.0f;
        tpars.P0[i + 3][i + 3] = 1.0f;
    }
    tpars.cd = 1.0f / (4.0f * (float)M_PI);

    void* hT3d;
    tracker3d_create(&hT3d, tpars);

    const int nsteps = 30;
    float obs_all[30][3], out_pos[30][3], out_n[30];
    float *target_pos, *target_var;
    int *target_IDs, nTargets;
    for (step = 0; step < nsteps; step++) {
        double az = -0.4 + 0.06 * step, el = 0.2 + 0.01 * step;
        float obs[3];
        obs[0] = (float)(cos(el) * cos(az));
        obs[1] = (float)(cos(el) * sin(az));
        obs[2] = (float)sin(el);
        memcpy(obs_all[step], obs, sizeof(obs));
        target_pos = NULL; target_var = NULL; target_IDs = NULL;
        tracker3d_step(hT3d, obs, 1, &target_pos, &target_var, &target_IDs,
                       &nTargets);
        out_n[step] = (float)nTargets;
        if (nTargets > 0)
            memcpy(out_pos[step], target_pos, 3 * sizeof(float));
        else
            memset(out_pos[step], 0, 3 * sizeof(float));
    }
    tracker3d_destroy(&hT3d);
    dump("trk_e2e_obs", obs_all, 90, "f4", "30,3");
    dump("trk_e2e_pos", out_pos, 90, "f4", "30,3");
    dump("trk_e2e_n", out_n, 30, "f4", "30");
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

    golden_beamweights();
    printf("beam weight goldens done\n");
    golden_sector_coeffs();
    printf("sector coeff goldens done\n");
    golden_array_proc();
    printf("array proc goldens done\n");
    golden_tracker_core();
    printf("tracker core goldens done\n");
    golden_tracker_e2e();
    printf("tracker e2e goldens done\n");

    fclose(manifest);
    return 0;
}
