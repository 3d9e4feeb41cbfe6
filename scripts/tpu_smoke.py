"""On-TPU integration smoke test: run every complex-free fast-path model for
a few blocks with a fenced readback and report max|y| + wall time.

Usage: python scripts/tpu_smoke.py   (expects a TPU backend; also runs on
CPU, where the pallas kernels fall back to interpreter mode).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def fenced(f, *args):
    out = f(*args)
    v = float(out[0] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    out = f(*args)
    v = float(out[0] if isinstance(out, tuple) else out)
    return v, time.perf_counter() - t0


def main():
    # fail fast with a diagnostic (not an external rc=124 kill) if the
    # device->host tunnel is wedged — see runtime/watchdog.py
    from spatial_audio_framework_tpu.runtime.watchdog import probe_device
    rtt = probe_device(timeout_s=float(
        os.environ.get("SAF_SMOKE_PROBE_TIMEOUT_S", "120")))
    print(f"device probe ok: fence rtt {1e3 * rtt:.1f} ms", flush=True)

    rng = np.random.default_rng(0)
    S, T = 8, 16 * 128
    results = []

    from spatial_audio_framework_tpu.models import (ambi_bin, ambi_dec,
                                                    ambi_drc, binauraliser,
                                                    decorrelator, panner,
                                                    roombinauraliser)

    # ambi_bin
    cfg = ambi_bin.AmbiBinConfig(order=3, method="magls")
    w = ambi_bin.design_ri(cfg)
    st = ambi_bin.init_state_batched(cfg, S)
    x = jnp.asarray(rng.uniform(-1, 1, (S, cfg.nsh, T)).astype(np.float32))
    f = jax.jit(lambda w, s, x: (
        jnp.max(jnp.abs(ambi_bin.process_ri_batched(cfg, w, s, x)[0]))))
    results.append(("ambi_bin",) + fenced(f, w, st, x))

    # binauraliser
    bcfg = binauraliser.BinauraliserConfig(n_sources=2, enable_rotation=True)
    bw = binauraliser.design_ri(bcfg)
    bst = binauraliser.init_state_batched(bcfg, S)
    bx = jnp.asarray(rng.uniform(-1, 1, (S, 2, T)).astype(np.float32))
    dirs = jnp.asarray(rng.uniform(-90, 90, (S, 2, 2)).astype(np.float32))
    ypr = jnp.zeros((S, 3), jnp.float32)
    fb = jax.jit(lambda s, x: (jnp.max(jnp.abs(
        binauraliser.process_ri_batched(bcfg, bw, s, x, dirs, None, ypr)[0]))))
    results.append(("binauraliser",) + fenced(fb, bst, bx))

    # roombinauraliser (synthetic ring grid)
    azis = -180.0 + 30.0 * np.arange(12)
    gdirs = np.stack([azis, np.zeros(12)], -1)
    brirs = 0.05 * rng.standard_normal((2, 12, 2, 128)).astype(np.float32)
    brirs[:, :, :, 4] += 1.0
    rcfg, rw = roombinauraliser.design_ri(
        roombinauraliser.RoomBinauraliserConfig(
            n_sources=2, enable_hrir_diff_eq=False), brirs, gdirs, 48000)
    rst = roombinauraliser.init_state_batched(rcfg, S)
    rx = jnp.asarray(rng.uniform(-1, 1, (S, 2, T)).astype(np.float32))
    fr = jax.jit(lambda s, x: (jnp.max(jnp.abs(
        roombinauraliser.process_ri_batched(rcfg, rw, s, x,
                                            ypr=ypr)[0]))))
    results.append(("roombinauraliser",) + fenced(fr, rst, rx))

    # ambi_dec
    ls = np.array([[30.0, 0], [-30, 0], [110, 0], [-110, 0], [0, 90]],
                  np.float64)
    dcfg = ambi_dec.AmbiDecConfig(master_order=1)
    dw = ambi_dec.design_ri(dcfg, ls)
    dst = ambi_dec.init_state_batched(dcfg, S, 5)
    dx = jnp.asarray(rng.uniform(-1, 1, (S, dcfg.nsh, T)).astype(np.float32))
    fd = jax.jit(lambda s, x: (jnp.max(jnp.abs(
        ambi_dec.process_ri_batched(dcfg, dw, s, x)[0]))))
    results.append(("ambi_dec",) + fenced(fd, dst, dx))

    # binauraliser_nf (distance-dependent DVF shelves in real arithmetic)
    from spatial_audio_framework_tpu.models import binauraliser_nf
    ncfg = binauraliser_nf.BinauraliserNFConfig(n_sources=2,
                                                enable_rotation=False)
    nw = binauraliser_nf.design_ri(ncfg)
    nst = binauraliser_nf.init_state_batched(ncfg, S)
    ndists = jnp.asarray(rng.uniform(0.2, 1.5, (S, 2)).astype(np.float32))
    fnf = jax.jit(lambda s, x: (jnp.max(jnp.abs(
        binauraliser_nf.process_ri_batched(ncfg, nw, s, x, dirs,
                                           ndists)[0]))))
    results.append(("binauraliser_nf",) + fenced(fnf, nst, bx))

    # tvconv (batched scan-free crossfading convolver, RI)
    from spatial_audio_framework_tpu.models import conv_examples
    tv = conv_examples.TVConvExample()
    tirs = 0.1 * rng.standard_normal((4, 2, 512)).astype(np.float32)
    tirs[:, :, 0] += 1.0
    tpos = rng.uniform(0, 5, (4, 3)).astype(np.float32)
    tconv, tH, tposd = tv.design_ri(tirs, tpos)
    tx = jnp.asarray(rng.uniform(-1, 1, (T,)).astype(np.float32))
    ftv = jax.jit(lambda s, x: (jnp.max(jnp.abs(tv.process_ri(
        tconv, tH, s, x, jnp.asarray(tpos[1]), tposd)[0]))))
    results.append(("tvconv",) + fenced(ftv, tv.init_state_ri(tconv), tx))

    # panner
    pcfg = panner.PannerConfig(n_sources=2, n_loudspeakers=5)
    pw = panner.design(pcfg, ls)
    pst = panner.init_state_batched(pcfg, S, 5)
    px = jnp.asarray(rng.uniform(-1, 1, (S, 2, T)).astype(np.float32))
    pdirs = jnp.asarray(rng.uniform(-90, 90, (S, 2, 2)).astype(np.float32))
    fp = jax.jit(lambda s, x: (jnp.max(jnp.abs(
        panner.process_ri_batched(pcfg, pw, s, x, pdirs)[0]))))
    results.append(("panner",) + fenced(fp, pst, px))

    # ambi_drc
    ccfg = ambi_drc.AmbiDrcConfig(order=1, theshold_db=-20.0)
    cst = ambi_drc.init_state_batched(ccfg, S)
    cx = jnp.asarray(rng.uniform(-1, 1, (S, ccfg.nsh, T)).astype(np.float32))
    fc = jax.jit(lambda s, x: (jnp.max(jnp.abs(
        ambi_drc.process_ri_batched(ccfg, s, x)[0]))))
    results.append(("ambi_drc",) + fenced(fc, cst, cx))

    # decorrelator
    dcfg = decorrelator.DecorrelatorConfig(n_channels=2)
    dd = decorrelator.design(dcfg)
    dcst = decorrelator.init_state_batched(dcfg, dd, S)
    dcx = jnp.asarray(rng.uniform(-1, 1, (S, 2, T)).astype(np.float32))
    fdc = jax.jit(lambda s, x: (jnp.max(jnp.abs(
        decorrelator.process_ri_batched(dcfg, dd, s, x)[0]))))
    results.append(("decorrelator",) + fenced(fdc, dcst, dcx))

    # --- analyser family (complex-free RI internals, readback-safe) ------
    from spatial_audio_framework_tpu.models import (dirass, pitch_shifter,
                                                    powermap, sldoa, spreader)
    from spatial_audio_framework_tpu.modules import sh as sh_mod

    Y3 = sh_mod.get_rsh(3, np.array([[40.0, 10.0]]))[:, 0:1]
    ax = jnp.asarray((Y3 * rng.uniform(-1, 1, (1, T))).astype(np.float32))

    # powermap (MUSIC mode exercises the embedded eigh)
    pmc = powermap.PowermapConfig(master_order=3, mode=powermap.PM_MUSIC,
                                  norm="n3d")
    pmw = powermap.design(pmc)
    pmst = powermap.init_state(pmc, pmw)
    fpm = jax.jit(lambda s, x: jnp.max(powermap.analysis(pmc, pmw, s, x)[0]))
    results.append(("powermap",) + fenced(fpm, pmst, ax))

    # sldoa
    slc = sldoa.SldoaConfig(master_order=3, norm="n3d")
    slw = sldoa.design(slc)
    slst = sldoa.init_state(slc)
    fsl = jax.jit(lambda s, x: jnp.max(jnp.abs(
        sldoa.analysis(slc, slw, s, x)[0].energy)) * 1e-9)
    results.append(("sldoa",) + fenced(fsl, slst, ax))

    # dirass
    drc = dirass.DirassConfig(input_order=3, mode="upscale", norm="n3d")
    drw = dirass.design(drc)
    drst = dirass.init_state(drc, drw)
    fdr = jax.jit(lambda s, x: jnp.max(dirass.analysis(drc, drw, s, x)[0]))
    results.append(("dirass",) + fenced(fdr, drst, ax))

    # spreader (OM mode: CDF4SAP solves via the real embedding)
    spc = spreader.SpreaderConfig(n_sources=1, mode=spreader.MODE_OM)
    spw = spreader.design(spc)
    spst = spreader.init_state(spc, spw)
    spx = jnp.asarray(rng.uniform(-1, 1, (1, T)).astype(np.float32))
    spd = jnp.asarray(np.array([[60.0, 0.0]], np.float32))
    sps = jnp.asarray(np.array([90.0], np.float32))
    fsp = jax.jit(lambda s, x: jnp.max(jnp.abs(
        spreader.process(spc, spw, s, x, spd, sps)[0])))
    results.append(("spreader",) + fenced(fsp, spst, spx))

    # pitch_shifter (full 8192 FFT; DFT operators as jit arguments)
    psc = pitch_shifter.PitchShifterConfig(n_ch=1)
    psm = pitch_shifter.design(psc)
    psst = pitch_shifter.init_state(psc)
    psx = jnp.asarray(rng.uniform(-1, 1, (1, T)).astype(np.float32))
    fps = jax.jit(lambda s, x, m: jnp.max(jnp.abs(
        pitch_shifter.process(psc, s, x, jnp.float32(1.5), mats=m)[0])))
    results.append(("pitch_shifter",) + fenced(
        lambda s, x: fps(s, x, psm), psst, psx))

    # hades (fused single-dispatch analysis + BMVDR synthesis, all RI)
    from spatial_audio_framework_tpu.modules import hades
    hana = hades.HadesAnalysis()
    hsyn = hades.HadesSynthesis(hana,
                                beam_option=hades.HADES_BEAMFORMER_BMVDR)
    hpipe = hades.HadesPipeline(hana, hsyn)
    hx = jnp.asarray(rng.uniform(
        -1, 1, (2, hana.blocksize)).astype(np.float32))
    hst = hpipe.init_state()

    def hades_run(s, x):
        y, s = hpipe.process(s, x)
        return jnp.max(jnp.abs(y))

    results.append(("hades",) + fenced(hades_run, hst, hx))

    # ambi_enc (frame-based crossfading SH encoder)
    from spatial_audio_framework_tpu.models import ambi_enc
    ecfg = ambi_enc.AmbiEncConfig(order=3, n_sources=4)
    eout = ambi_enc.design(ecfg)
    edirs = jnp.asarray(rng.uniform(-90, 90, (4, 2)).astype(np.float32))
    est = ambi_enc.init_state(ecfg, np.asarray(edirs))
    ex = jnp.asarray(rng.uniform(
        -1, 1, (4, ecfg.frame_size)).astype(np.float32))
    # one warm-up frame: the reference encodes the PREVIOUS frame's input
    # (one-frame latency), so the very first output frame is silence and
    # a 0.0 peak would not prove the encoder works
    est = ambi_enc.process(ecfg, eout, est, ex, edirs)[1]
    fe = jax.jit(lambda s, x: jnp.max(jnp.abs(
        ambi_enc.process(ecfg, eout, s, x, edirs)[0])))
    results.append(("ambi_enc",) + fenced(fe, est, ex))

    # beamformer (frame-based, crossfaded steering weights)
    from spatial_audio_framework_tpu.models import beamformer
    bfc = beamformer.BeamformerConfig(order=3, n_beams=4)
    bW = beamformer.design(bfc, np.asarray(rng.uniform(-90, 90, (4, 2))))
    bfst = beamformer.init_state(bfc)
    bfx = jnp.asarray(rng.uniform(
        -1, 1, (bfc.nsh, bfc.frame_size)).astype(np.float32))
    fbf = jax.jit(lambda s, x: jnp.max(jnp.abs(
        beamformer.process(bfc, bW, s, x)[0])))
    # warm the state so the crossfade sees a previous frame
    _, bfst = jax.jit(lambda s, x: beamformer.process(bfc, bW, s, x))(bfst,
                                                                     bfx)
    results.append(("beamformer",) + fenced(fbf, bfst, bfx))

    # rotator (traced yaw-pitch-roll SH rotation)
    from spatial_audio_framework_tpu.models import rotator
    rtc = rotator.RotatorConfig(order=3)
    rtw = rotator.design(rtc)
    rtst = rotator.init_state(rtc)
    rtx = jnp.asarray(rng.uniform(
        -1, 1, (rtc.nsh, rtc.frame_size)).astype(np.float32))
    rypr = jnp.asarray(np.array([0.7, -0.2, 0.1], np.float32))
    frt = jax.jit(lambda s, x: jnp.max(jnp.abs(
        rotator.process(rtc, rtw, s, x, rypr)[0])))
    _, rtst = jax.jit(lambda s, x: rotator.process(rtc, rtw, s, x, rypr))(
        rtst, rtx)
    results.append(("rotator",) + fenced(frt, rtst, rtx))

    # array2sh (Eigenmike32-style SMA encoding, RI fast path)
    from spatial_audio_framework_tpu.models import array2sh
    from spatial_audio_framework_tpu.utils import presets as _presets
    em32 = np.degrees(_presets.mic_preset("eigenmike32"))
    acfg = array2sh.Array2SHConfig(order=4)
    aw = array2sh.design_ri(acfg, em32)
    ast = array2sh.init_state_batched(acfg, S, em32.shape[0])
    axx = jnp.asarray(rng.uniform(
        -1, 1, (S, em32.shape[0], T)).astype(np.float32))
    fa = jax.jit(lambda s, x: jnp.max(jnp.abs(
        array2sh.process_ri_batched(acfg, aw, s, x)[0])))
    results.append(("array2sh",) + fenced(fa, ast, axx))

    # ambi_roomsim (image-source shoebox → partitioned MatrixConv)
    from spatial_audio_framework_tpu.models import ambi_roomsim
    rsc = ambi_roomsim.AmbiRoomSimConfig(n_sources=2, n_receivers=1,
                                         sh_order=2, refl_order=2)
    rsw = ambi_roomsim.design_ri(
        rsc, np.array([[2.0, 3.0, 1.5], [4.0, 2.0, 1.7]]),
        np.array([[3.0, 2.5, 1.6]]))
    rsst = ambi_roomsim.init_state_ri(rsc, rsw)
    rsx = jnp.asarray(rng.uniform(-1, 1, (2, T)).astype(np.float32))
    frs = jax.jit(lambda s, x: jnp.max(jnp.abs(
        ambi_roomsim.process_ri(rsc, rsw, s, x)[0])))
    results.append(("ambi_roomsim",) + fenced(frs, rsst, rsx))

    # matrixconv + multiconv (partitioned RI block convolvers)
    from spatial_audio_framework_tpu.models import conv_examples
    mce = conv_examples.MatrixConvExample()
    Hm = 0.1 * rng.standard_normal((2, 4, 1024)).astype(np.float32)
    mconv, mH = mce.design_ri(Hm)
    mst = mce.init_state_ri(mconv)
    mx = jnp.asarray(rng.uniform(-1, 1, (4, T)).astype(np.float32))
    fmc = jax.jit(lambda s, x: jnp.max(jnp.abs(
        mce.process_ri(mconv, mH, s, x)[0])))
    results.append(("matrixconv",) + fenced(fmc, mst, mx))

    mue = conv_examples.MultiConvExample()
    Hu = 0.1 * rng.standard_normal((4, 1024)).astype(np.float32)
    uconv, uH = mue.design_ri(Hu)
    ust = mue.init_state_ri(uconv)
    fuc = jax.jit(lambda s, x: jnp.max(jnp.abs(
        mue.process_ri(uconv, uH, s, x)[0])))
    results.append(("multiconv",) + fenced(fuc, ust, mx))

    dev = jax.devices()[0]
    print(f"device: {dev}")
    ok = True
    for name, peak, dt in results:
        good = np.isfinite(peak) and peak < 100.0
        ok &= bool(good)
        print(f"  {name:18s} peak={peak:8.4f}  {1e3 * dt:7.2f} ms "
              f"({'ok' if good else 'BAD'})")
    print("ALL OK" if ok else "FAILURES PRESENT")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
