"""Demo: HADES hearing-assistive binaural rendering.

Runs on any backend (CPU included).  Simulates a binaural (2-mic) array
signal — a talker at −60° in diffuse babble — and renders it through the
fused HADES pipeline (analysis: COMEDIE diffuseness + sdMUSIC DoA;
synthesis: binaural MVDR + covariance matching), including a
HadesRadialEditor-style directional gain edit through the two-stage path.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

from spatial_audio_framework_tpu.modules import hades
from spatial_audio_framework_tpu.modules.hrir import default_hrirs
from spatial_audio_framework_tpu.utils.geometry import unit_sph2cart


def binaural_scene(azi_deg, elev_deg, T, snr_db=0.0, seed=0):
    """Talker from (azi, elev) through the nearest default HRIR + diffuse
    noise from 24 directions."""
    from scipy.signal import fftconvolve

    hrirs, dirs, fs = default_hrirs()
    rng = np.random.default_rng(seed)
    u = np.asarray(unit_sph2cart(dirs.astype(np.float64), degrees=True))
    v = np.asarray(unit_sph2cart(
        np.array([[azi_deg, elev_deg]]), degrees=True))[0]
    talker = rng.uniform(-1, 1, T).astype(np.float32)
    x = np.stack([fftconvolve(talker, hrirs[np.argmax(u @ v), e])[:T]
                  for e in range(2)])
    g = 10.0 ** (-snr_db / 20.0) / np.sqrt(24.0)
    for k in rng.choice(len(dirs), 24, replace=False):
        n = rng.uniform(-1, 1, T).astype(np.float32)
        x += g * np.stack([fftconvolve(n, hrirs[k, e])[:T] for e in range(2)])
    return x.astype(np.float32), fs


def main():
    ana = hades.HadesAnalysis()
    syn = hades.HadesSynthesis(ana,
                               beam_option=hades.HADES_BEAMFORMER_BMVDR)
    pipe = hades.HadesPipeline(ana, syn)

    n_blocks = 24
    x, fs = binaural_scene(-60.0, 0.0, n_blocks * ana.blocksize)
    blocks = jnp.asarray(x.reshape(2, n_blocks, ana.blocksize)
                         .transpose(1, 0, 2))

    # fused path: all blocks in one dispatch
    ys, _ = pipe.process_chunk(pipe.init_state(), blocks)
    y = np.asarray(ys).transpose(1, 0, 2).reshape(2, -1)
    print(f"fused pipeline: rendered {y.shape[-1] / fs:.2f}s, "
          f"peak {np.abs(y).max():.3f}")

    # two-stage path with a radial edit: attenuate everything right of
    # centre by 24 dB (e.g. suppress a competing talker side)
    gains_db = np.zeros(360)
    gains_db[180:] = -24.0
    editor = hades.HadesRadialEditor(ana.grid_dirs_deg)
    outs = []
    for b in range(n_blocks):
        params, sigs = ana.apply(np.asarray(blocks[b]))
        params = editor.apply(params, gains_db)
        outs.append(syn.apply(params, sigs))
    y_ed = np.concatenate(outs, -1)
    print(f"radial-edited:  peak {np.abs(y_ed).max():.3f} "
          f"(direct stream right of centre attenuated)")

    # the analysis's mid-band DoA should point at the talker
    sel = slice(10, 60)
    azi = ana.grid_dirs_deg[params.doa_idx[sel], 0]
    frac = np.mean(np.abs(azi + 60) < 45)
    print(f"DoA: {100 * frac:.0f}% of mid bands within 45° of the talker")


if __name__ == "__main__":
    main()
