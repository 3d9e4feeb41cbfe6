"""Build hook: compile the native streaming runtime into the package.

The DSP itself is pure JAX; the only native code is the host-side real-time
plumbing (lock-free SPSC ring buffer, FIFO framer, codec/proc handshake —
native/saf_runtime.cpp, the analogue of the reference's utility/handshake
layer).  It is loaded via ctypes at import time, so the wheel just needs the
shared object placed inside spatial_audio_framework_tpu/runtime/; when no
compiler is available the package falls back to pure-Python equivalents and
the build proceeds without it.
"""
import os
import shutil
import subprocess
import sys

from setuptools import setup
from setuptools.command.build_py import build_py

ROOT = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(ROOT, "native", "saf_runtime.cpp")
LIB_NAME = f"libsaf_runtime-{sys.platform}.so"


class BuildPyWithNative(build_py):
    def run(self):
        super().run()
        dest_dir = os.path.join(self.build_lib,
                                "spatial_audio_framework_tpu", "runtime")
        if not os.path.isdir(dest_dir) or not os.path.exists(SRC):
            return
        shutil.copy2(SRC, os.path.join(dest_dir, "saf_runtime.cpp"))
        lib = os.path.join(dest_dir, LIB_NAME)
        cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
               SRC, "-o", lib]
        try:
            subprocess.run(cmd, check=True, timeout=300)
        except (OSError, subprocess.SubprocessError) as e:
            print(f"warning: native runtime not built ({e}); "
                  "pure-Python fallbacks will be used", file=sys.stderr)


setup(cmdclass={"build_py": BuildPyWithNative})
