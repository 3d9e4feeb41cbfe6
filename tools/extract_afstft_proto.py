"""Extract the afSTFT prototype-filter coefficient tables into a binary asset.

The afSTFT filterbank (reference: framework/resources/afSTFT/afSTFT_protoFilter.h)
is defined by two length-10240 coefficient tables (normal and low-delay
prototypes, designed per Lin & Vaidyanathan 1998).  These are numeric filter
*data* required for interoperability/parity; we store them as .npz.
"""
import re
import numpy as np

SRC = "/root/reference/framework/resources/afSTFT/afSTFT_protoFilter.h"
text = open(SRC).read()

def grab(name):
    m = re.search(re.escape(name) + r"\[10240\]\s*=\s*\{(.*?)\};", text, re.S)
    vals = re.findall(r"([-+0-9.eE]+)f", m.group(1))
    arr = np.array([float(v) for v in vals], dtype=np.float32)
    assert arr.shape == (10240,), arr.shape
    return arr

proto = grab("__afSTFT_protoFilter1024")
proto_ld = grab("__afSTFT_protoFilter1024LD")
np.savez_compressed("/root/repo/spatial_audio_framework_tpu/data/afstft_proto.npz",
                    proto1024=proto, proto1024_ld=proto_ld)
print("saved", proto[:3], proto_ld[:3], proto.sum(), proto_ld.sum())
