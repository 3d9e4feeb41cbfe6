"""Extract lattice all-pass decorrelator coefficient tables
(saf_utility_latticeCoeffs.c) into a binary asset."""
import re
import numpy as np

text = open("/root/reference/framework/modules/saf_utilities/saf_utility_latticeCoeffs.c", errors="replace").read()
out = {}
for m in re.finditer(r"const float (__lattice_coeffs_o\d+)\[(\d+)\]\[(\d+)\]\s*=\s*\{(.*?)\};", text, re.S):
    name, d0, d1, body = m.groups()
    vals = re.findall(r"[-+]?(?:\d+\.\d*(?:[eE][-+]?\d+)?|\.\d+(?:[eE][-+]?\d+)?|\d+(?:[eE][-+]?\d+)?)", body)
    arr = np.array([float(v) for v in vals], np.float32)
    shape = (int(d0), int(d1))
    assert arr.size == shape[0]*shape[1], (name, arr.size, shape)
    out[name.lstrip("_")] = arr.reshape(shape)
print({k: v.shape for k, v in out.items()})
np.savez_compressed("/root/repo/spatial_audio_framework_tpu/data/lattice_coeffs.npz", **out)
