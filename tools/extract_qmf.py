"""Extract QMF prototype filter + hybrid subdivision coefficient tables
(saf_utility_qmf.c:40-52) into a binary asset."""
import re
import numpy as np

text = open("/root/reference/framework/modules/saf_utilities/saf_utility_qmf.c", errors="replace").read()
def grab(name, n):
    m = re.search(re.escape(name) + r"\[\d+\]\s*=\s*\{(.*?)\};", text, re.S)
    vals = re.findall(r"[-+]?\d+\.\d+", m.group(1))
    arr = np.array([float(v) for v in vals])
    assert arr.size == n, (name, arr.size)
    return arr
np.savez_compressed("/root/repo/spatial_audio_framework_tpu/data/qmf_proto.npz",
                    proto=grab("__qmf_protofilter", 1280),
                    fb8=grab("__qmf_fb8bandCoeffs", 13),
                    fb4=grab("__qmf_fb4bandCoeffs", 13))
print("ok")
