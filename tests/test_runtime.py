"""Native streaming-runtime tests: ring buffer SPSC integrity, FIFO framer
latency semantics (matrixconv.c:117-151), status handshake
(_common.h:199-224), frame clock, and StreamRunner end-to-end with a jitted
model."""
import os
import threading

import numpy as np
import pytest

from spatial_audio_framework_tpu.runtime import (
    CODEC_STATUS_INITIALISED, FifoFramer, FrameClock, RingBuffer, StatusFlags,
    StreamRunner, native_available)


def test_native_library_builds():
    """g++ is part of the baked-in toolchain — the C++ path must be live."""
    assert native_available()


def test_ring_buffer_basic():
    rb = RingBuffer(16)
    assert rb.writable >= 16 and rb.readable == 0
    assert rb.write(np.arange(10, dtype=np.float32)) == 10
    assert rb.readable == 10
    got = rb.read(4)
    np.testing.assert_array_equal(got, [0, 1, 2, 3])
    # refuse to read more than available when partial=False
    assert rb.read(100).size == 0
    assert rb.read(100, partial=True).size == 6
    # overrun accounting
    cap = rb.writable
    assert rb.write(np.zeros(cap + 1, np.float32)) == 0
    assert rb.overruns == 1


@pytest.mark.goldens
def test_ring_buffer_spsc_threads():
    """1M floats through a small ring from a producer thread, verify order."""
    rb = RingBuffer(1 << 10)
    n = 1_000_000
    src = np.arange(n, dtype=np.float32)

    def produce():
        i = 0
        while i < n:
            w = rb.write(src[i:i + 256], partial=True)
            i += int(w)

    t = threading.Thread(target=produce)
    t.start()
    out = np.empty(n, np.float32)
    i = 0
    while i < n:
        got = rb.read(min(512, n - i), partial=True)
        out[i:i + got.size] = got
        i += got.size
    t.join()
    np.testing.assert_array_equal(out, src)
    assert rb.readable == 0


def test_fifo_framer_latency_and_regrouping():
    """Arbitrary host block sizes (here 48) regroup into 128-sample frames;
    a loopback process gives exactly one frame of latency."""
    F, n_ch = 128, 2
    fr = FifoFramer(n_ch, F)
    T = 48 * 40
    x = np.arange(n_ch * T, dtype=np.float32).reshape(n_ch, T)
    y = np.empty_like(x)
    for s in range(0, T, 48):
        y[:, s:s + 48] = fr.push_chunked(x[:, s:s + 48], lambda f: f)
    n_frames = T // F
    assert fr.frames_completed == n_frames
    # one-frame latency: y[t] == x[t - F] for t >= F (until last full frame)
    valid = n_frames * F
    np.testing.assert_array_equal(y[:, F:valid], x[:, :valid - F])
    np.testing.assert_array_equal(y[:, :F], 0.0)


def test_status_handshake():
    st = StatusFlags()
    st.end_init()
    assert st.codec == CODEC_STATUS_INITIALISED
    assert st.try_begin_process()
    # init thread must wait for the audio thread to finish the frame
    done = {}

    def reinit():
        done["ok"] = st.begin_init(timeout_ms=2000)
        st.end_init()

    t = threading.Thread(target=reinit)
    t.start()
    import time
    time.sleep(0.05)
    assert "ok" not in done          # blocked while proc ongoing
    assert not st.try_begin_process()  # audio path sees codec!=INITIALISED
    st.end_process()
    t.join()
    assert done["ok"]
    assert st.try_begin_process()
    st.end_process()


def test_frame_clock_rtf():
    c = FrameClock(fs=48000.0, frame_size=128)
    c.tick(375)  # exactly 1 second of audio
    assert c.frames == 375
    assert c.rtf > 1.0  # rendered instantly


def test_stream_runner_with_jitted_model():
    """End-to-end: ambi_enc through the runtime in odd-sized host blocks
    equals direct processing, delayed by one FIFO frame."""
    import jax
    import jax.numpy as jnp
    from spatial_audio_framework_tpu.models import ambi_enc

    cfg = ambi_enc.AmbiEncConfig(order=1, n_sources=1, frame_size=128)
    conv = ambi_enc.design(cfg)
    dirs = jnp.asarray(np.array([[30.0, 0.0]], np.float32))
    proc = jax.jit(lambda st, xx: ambi_enc.process(cfg, conv, st, xx, dirs))

    box = [ambi_enc.init_state(cfg, np.asarray(dirs))]

    def frame_fn(f):
        y, box[0] = proc(box[0], jnp.asarray(f))
        return np.asarray(y)

    runner = StreamRunner(frame_fn, n_ch_in=1, n_ch_out=4, frame_size=128)
    rng = np.random.default_rng(0)
    T = 128 * 10
    x = rng.uniform(-1, 1, (1, T)).astype(np.float32)
    y = np.concatenate([runner.process_block(x[:, s:s + 160])
                        for s in range(0, T, 160)], axis=1)
    # reference: same per-frame loop without the runtime, fresh state
    st = ambi_enc.init_state(cfg, np.asarray(dirs))
    refs = []
    for k in range(T // 128):
        r, st = proc(st, jnp.asarray(x[:, k * 128:(k + 1) * 128]))
        refs.append(np.asarray(r))
    ref = np.concatenate(refs, axis=1)
    np.testing.assert_allclose(y[:, 128:], ref[:, :T - 128], atol=1e-6)
    assert runner.clock.frames == T // 128


def test_python_fallback_paths(monkeypatch):
    """The same API must work without a C++ toolchain (pure-Python ring/
    framer/status/clock)."""
    from spatial_audio_framework_tpu.runtime import native as N
    monkeypatch.setattr(N, "_load", lambda: None)
    rb = N.RingBuffer(16)
    assert rb.write(np.arange(5, dtype=np.float32)) == 5
    np.testing.assert_array_equal(rb.read(5), np.arange(5))
    fr = N.FifoFramer(1, 8)
    x = np.arange(24, dtype=np.float32)[None]
    y = fr.push_chunked(x, lambda f: f + 1.0)
    assert fr.frames_completed == 3
    np.testing.assert_array_equal(y[:, 8:16], x[:, :8] + 1.0)
    st = N.StatusFlags()
    st.end_init()
    assert st.try_begin_process()
    st.end_process()
    c = N.FrameClock(48000.0, 128)
    c.tick(2)
    assert c.frames == 2 and c.rtf > 0


def test_stream_runner_render_thread():
    """Decoupled mode: push/pull through lock-free rings, render thread does
    the processing; passthrough content is preserved in order."""
    runner = StreamRunner(lambda f: 2.0 * f, n_ch_in=1, n_ch_out=1,
                          frame_size=128)
    runner.start()
    try:
        T = 128 * 32
        x = np.arange(T, dtype=np.float32)[None] / T
        fed = 0
        got = []
        import time
        deadline = time.monotonic() + 10.0
        while sum(g.shape[1] for g in got) < T:
            if fed < T:
                fed += runner.push(x[:, fed:fed + 256])
            chunk = runner.pull(256)
            if chunk.size:
                got.append(chunk)
            if time.monotonic() > deadline:
                pytest.fail("render thread stalled")
        y = np.concatenate(got, axis=1)[:, :T]
        np.testing.assert_allclose(y, 2.0 * x, atol=1e-6)
    finally:
        runner.stop()


def test_framer_rejects_wrong_channel_count():
    """The native saf_framer_push writes n_ch*nSamples floats into the out
    buffer unconditionally — a mismatched channel count must be a Python
    ValueError, not heap corruption."""
    from spatial_audio_framework_tpu.runtime.native import FifoFramer

    fr = FifoFramer(8, 128)
    with pytest.raises(ValueError):
        fr.push(np.zeros((2, 128), np.float32))
    with pytest.raises(ValueError):
        fr.set_output(np.zeros((2, 128), np.float32))


def test_begin_init_timeout_restores_codec():
    """A begin_init that times out (audio thread stuck ONGOING) must restore
    the previous codec state — leaving it INITIALISING would wedge
    try_begin_process into silence forever."""
    from spatial_audio_framework_tpu.runtime import native as rt

    st = rt.StatusFlags()
    st.end_init()                      # codec = INITIALISED
    assert st.try_begin_process()      # proc = ONGOING (never ended)
    assert not st.begin_init(timeout_ms=50)
    assert st.codec == rt.CODEC_STATUS_INITIALISED  # restored, not wedged
    st.end_process()
    assert st.try_begin_process()      # processing works again
    st.end_process()


def test_native_locate_prefers_repo_then_package(tmp_path, monkeypatch):
    """Installed wheels carry saf_runtime.cpp + the .so inside runtime/
    (setup.py BuildPyWithNative); checkouts keep them under native/.  The
    loader must resolve whichever layout exists."""
    from spatial_audio_framework_tpu.runtime import native as nat

    # repo layout present -> native/ wins
    src, lib = nat._locate()
    assert src.endswith(os.path.join("native", "saf_runtime.cpp"))

    # simulate an installed wheel: no repo native/, lib inside the pkg dir
    fake_root = tmp_path / "site-packages"
    fake_pkg = fake_root / "spatial_audio_framework_tpu" / "runtime"
    fake_pkg.mkdir(parents=True)
    (fake_pkg / nat._LIB_NAME).write_bytes(b"")
    monkeypatch.setattr(nat, "_REPO_ROOT", str(fake_root / "nowhere"))
    monkeypatch.setattr(nat, "_PKG_DIR", str(fake_pkg))
    src, lib = nat._locate()
    assert lib == str(fake_pkg / nat._LIB_NAME)
