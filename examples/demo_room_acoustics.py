"""Demo: image-source room simulation → Ambisonic RIRs → streaming render,
plus the time-domain echogram applicator for a moving source."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from spatial_audio_framework_tpu.models import ambi_roomsim
from spatial_audio_framework_tpu.modules import reverb


def main():
    fs = 48000.0
    room = reverb.ShoeboxRoom(np.array([7.0, 5.0, 3.0]),
                              np.array([[0.3, 0.3, 0.35, 0.35, 0.5, 0.5]]),
                              fs=fs)
    room.add_source([2.0, 1.5, 1.2])
    room.add_receiver_sh(1, [4.5, 3.0, 1.5])   # first-order SH receiver
    room.compute_echograms(max_order=3)
    rirs = room.render_rirs()
    rir = rirs[(0, 0)]
    print(f"RIR: {rir.shape[0]} SH channels × {rir.shape[1]} samples "
          f"({rir.shape[1] / fs * 1000:.0f} ms)")

    # streaming render via the TD applicator (jit once, stream blocks)
    taps = room.pack_taps(0, max_taps=512)
    app = room.td_applicator(0, max_delay=8192)
    st = app.init_state()
    proc = jax.jit(lambda s, x: app.process(s, x, taps))
    rng = np.random.default_rng(0)
    out = []
    for _ in range(8):
        x = rng.uniform(-1, 1, (1, 1024)).astype(np.float32)
        y, st = proc(st, jnp.asarray(x))
        out.append(np.asarray(y))
    y = np.concatenate(out, -1)
    print(f"streamed {y.shape[1] / fs * 1000:.0f} ms through "
          f"{taps.values.shape[-1]}-tap echogram, energy {float((y**2).sum()):.3f}")

    # the ambi_roomsim model (partitioned-convolution path)
    cfg = ambi_roomsim.AmbiRoomSimConfig(sh_order=1, n_sources=1)
    print("ambi_roomsim config ready:", cfg)
    print("ok")


if __name__ == "__main__":
    main()
