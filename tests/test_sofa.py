"""SOFA reader tests: fixture round-trip + use in ambi_bin/binauraliser
(the reference's SOFA tests are fixture-by-path; here we synthesise one,
test__sofa_reader_module.c recipe)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spatial_audio_framework_tpu.modules import sofa
from spatial_audio_framework_tpu.modules.hrir import default_hrirs


@pytest.fixture(scope="module")
def sofa_file(tmp_path_factory):
    hrirs, dirs_deg, fs = default_hrirs()
    sub = hrirs[::8]  # 105 dirs, keep the test light
    pos = np.concatenate([dirs_deg[::8], np.full((sub.shape[0], 1), 1.2)], -1)
    path = str(tmp_path_factory.mktemp("sofa") / "test.sofa")
    sofa.sofa_save(path, sub.astype(np.float64), fs, pos)
    return path, sub, pos, fs


def test_sofa_open(sofa_file):
    path, sub, pos, fs = sofa_file
    c = sofa.sofa_open(path)
    assert c.n_sources == sub.shape[0]
    assert c.n_receivers == 2
    assert c.data_length_ir == sub.shape[-1]
    assert c.data_sampling_rate == fs
    np.testing.assert_allclose(c.data_ir, sub, atol=1e-6)
    np.testing.assert_allclose(c.source_dirs_deg(), pos[:, :2], atol=1e-5)
    assert c.global_attrs["SOFAConventions"] == "SimpleFreeFieldHRIR"
    assert c.var_attrs["SourcePosition:Type"] == "spherical"


def test_sofa_hrir_usecase_validation(sofa_file, tmp_path):
    path, sub, pos, fs = sofa_file
    sofa.sofa_open(path, usecase=sofa.USECASE_HRIR)  # 2 receivers → OK
    bad = str(tmp_path / "bad.sofa")
    sofa.sofa_save(bad, np.zeros((4, 3, 16)), 48000.0, np.zeros((4, 3)))
    with pytest.raises(sofa.SofaError):
        sofa.sofa_open(bad, usecase=sofa.USECASE_HRIR)
    with pytest.raises(sofa.SofaError):
        sofa.sofa_open(str(tmp_path / "missing.sofa"))


def test_sofa_brir_usecase(tmp_path):
    path = str(tmp_path / "brir.sofa")
    sofa.sofa_save(path, np.zeros((2, 2, 64)), 48000.0, np.zeros((2, 3)),
                   conventions="MultiSpeakerBRIR")
    c = sofa.sofa_open(path, usecase=sofa.USECASE_BRIR)
    assert c.global_attrs["SOFAConventions"] == "MultiSpeakerBRIR"
    bad = str(tmp_path / "nb.sofa")
    sofa.sofa_save(bad, np.zeros((2, 2, 64)), 48000.0, np.zeros((2, 3)),
                   conventions="SimpleFreeFieldHRIR")
    with pytest.raises(sofa.SofaError):
        sofa.sofa_open(bad, usecase=sofa.USECASE_BRIR)


def test_ambi_bin_with_sofa(sofa_file):
    """ambi_bin with a SOFA-loaded HRIR set (ambi_bin.c:212-246 path)."""
    from spatial_audio_framework_tpu.models import ambi_bin
    from spatial_audio_framework_tpu.modules import sh

    path, _, _, _ = sofa_file
    c = sofa.sofa_open(path, usecase=sofa.USECASE_HRIR)
    cfg = ambi_bin.AmbiBinConfig(order=1, norm="n3d")
    w = ambi_bin.design(cfg, hrirs=c.data_ir.astype(np.float32),
                        hrir_dirs_deg=c.source_dirs_deg(),
                        hrir_fs=int(c.data_sampling_rate))
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (1, 24 * 128)).astype(np.float32)
    Y = sh.get_rsh(1, np.array([[90.0, 0.0]]))[:, 0].astype(np.float32)
    st = ambi_bin.init_state(cfg)
    y, _ = jax.jit(lambda w, s, xx: ambi_bin.process(cfg, w, s, xx))(
        w, st, jnp.asarray(Y[:, None] * x))
    y = np.asarray(y)
    d = cfg.afstft.proc_delay
    assert (y[0, d:] ** 2).sum() > 1.5 * (y[1, d:] ** 2).sum()


def test_load_hrirs_falls_back_on_missing_source_position(tmp_path, capsys):
    """A SOFA file that parses but has no SourcePosition dataset must take
    the default-HRIR fallback (ambi_bin.c:215-218 behaviour), not crash."""
    from spatial_audio_framework_tpu.modules.hrir import load_hrirs
    from spatial_audio_framework_tpu.utils import hdf5 as _h5

    w = _h5.HDF5Writer()
    w.add_root_attr("Conventions", "SOFA")
    w.add_root_attr("SOFAConventions", "SimpleFreeFieldHRIR")
    w.add_root_attr("DataType", "FIR")
    w.add_dataset("Data.IR", np.zeros((4, 2, 16)))
    w.add_dataset("Data.SamplingRate", np.asarray([48000.0]),
                  attrs={"Units": "hertz"})
    path = str(tmp_path / "nopos.sofa")
    w.save(path)
    h, d, fs, used_default = load_hrirs(sofa_filepath=path, use_default=False)
    assert used_default
    assert h.shape[0] == d.shape[0]


def test_hdf5_writer_h5py_interop(tmp_path):
    """Files from HDF5Writer must be readable by libhdf5 (superblock EOF at
    offset 40, IEEE binary64 bias 1023, local-heap free-list head = 1)."""
    h5py = pytest.importorskip("h5py")
    from spatial_audio_framework_tpu.utils import hdf5 as _h5

    w = _h5.HDF5Writer()
    w.add_root_attr("Conventions", "SOFA")
    a64 = np.arange(12, dtype=np.float64).reshape(3, 4) * 1.5
    a32 = np.arange(6, dtype=np.float32).reshape(2, 3) + 0.25
    w.add_dataset("D64", a64, attrs={"Units": "m"})
    w.add_dataset("D32", a32)
    path = str(tmp_path / "interop.h5")
    w.save(path)
    with h5py.File(path, "r") as f:
        assert set(f.keys()) == {"D32", "D64"}
        np.testing.assert_allclose(f["D64"][...], a64)
        np.testing.assert_allclose(f["D32"][...], a32)
        assert f.attrs["Conventions"] == b"SOFA"
        assert f["D64"].attrs["Units"] == b"m"


def test_hdf5_reader_reads_h5py_compressed(tmp_path):
    """Our reader handles libhdf5-written chunked gzip+shuffle datasets."""
    h5py = pytest.importorskip("h5py")
    from spatial_audio_framework_tpu.utils.hdf5 import read_hdf5

    a = np.arange(240.0).reshape(10, 24) * 0.5
    path = str(tmp_path / "v1.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("comp", data=a, chunks=(5, 12),
                         compression="gzip", shuffle=True)
    root = read_hdf5(path)
    np.testing.assert_allclose(root.datasets["comp"].data, a)
