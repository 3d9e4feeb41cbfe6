"""Extract loudspeaker/sensor-array/grid preset data tables into npz assets.

These are numeric direction/geometry tables (t-designs, sphere coverings,
loudspeaker layouts, microphone-array geometries) from
framework/modules/saf_utilities/saf_utility_{loudspeaker,sensorarray}_presets.c
-- public mathematical/measurement data required for capability parity.
"""
import re
import numpy as np

OUT = {}
for src in [
    "/root/reference/framework/modules/saf_utilities/saf_utility_loudspeaker_presets.c",
    "/root/reference/framework/modules/saf_utilities/saf_utility_sensorarray_presets.c",
]:
    text = open(src, errors="replace").read()
    # float/double 1-D and 2-D arrays
    for m in re.finditer(
        r"const (float|double|int) (__[A-Za-z0-9_]+)\[(\d+)\](?:\[(\d+)\])?\s*=\s*\{(.*?)\};",
        text, re.S):
        dtype, name, d0, d1, body = m.groups()
        if "HANDLES" in name:
            continue
        vals = re.findall(r"[-+]?(?:\d+\.\d*(?:[eE][-+]?\d+)?|\.\d+(?:[eE][-+]?\d+)?|\d+(?:[eE][-+]?\d+)?)", body)
        arr = np.array([float(v) for v in vals])
        shape = (int(d0), int(d1)) if d1 else (int(d0),)
        if arr.size != np.prod(shape):
            # C zero-fills partially-initialised arrays
            assert arr.size < np.prod(shape), name
            arr = np.concatenate([arr, np.zeros(int(np.prod(shape)) - arr.size)])
        arr = arr.reshape(shape)
        arr = arr.astype(np.int32 if dtype == "int" else np.float32)
        OUT[name.lstrip("_")] = arr

print(len(OUT), "tables")
tot = sum(a.size for a in OUT.values())
print("total elems", tot)
np.savez_compressed("/root/repo/spatial_audio_framework_tpu/data/presets.npz", **OUT)
for k in list(OUT)[:5]:
    print(k, OUT[k].shape)
import os
print("file size", os.path.getsize("/root/repo/spatial_audio_framework_tpu/data/presets.npz"))
