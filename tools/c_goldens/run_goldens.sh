#!/bin/bash
# Compile + run the golden generator against the built reference, then pack
# the outputs into tests/goldens/c_goldens.npz.  Requires build_ref.sh first.
set -euo pipefail

HERE="$(cd "$(dirname "$0")" && pwd)"
SRC=/tmp/saf_ref_src
BUILD=/tmp/saf_ref_build
OUT=/tmp/saf_goldens
OB=/opt/venv/lib/python3.12/site-packages/opencv_python.libs/libopenblasp-r0-59ffcd50.3.15.so

mkdir -p "$OUT"
rm -f "$OUT/manifest.txt"   # generators append; start clean
cc -O2 -std=gnu99 -DSAF_USE_OPEN_BLAS_AND_LAPACKE=1 -DHAVE_LAPACK_CONFIG_H \
  -I"$SRC/framework/include" -I"$SRC/examples/include" \
  -I"$HERE/shim" \
  -I/opt/venv/lib/python3.12/site-packages/tensorflow/include/Eigen/src/misc \
  "$HERE/gen_goldens.c" "$HERE/shim/lapacke_fix.c" \
  "$BUILD/examples/libsaf_example_ambi_bin.a" \
  "$BUILD/framework/libsaf.a" \
  "$OB" -lm -o "$OUT/gen_goldens"

cc -O2 -std=gnu99 -DSAF_USE_OPEN_BLAS_AND_LAPACKE=1 -DHAVE_LAPACK_CONFIG_H \
  -I"$SRC/framework/include" -I"$SRC/examples/include" \
  -I"$SRC/framework/modules/saf_reverb" \
  -I"$HERE/shim" \
  -I/opt/venv/lib/python3.12/site-packages/tensorflow/include/Eigen/src/misc \
  "$HERE/gen_goldens2.c" "$HERE/shim/lapacke_fix.c" \
  "$BUILD/examples/libsaf_example_binauraliser.a" \
  "$BUILD/framework/libsaf.a" \
  "$OB" -lm -o "$OUT/gen_goldens2"

cc -O2 -std=gnu99 -DSAF_USE_OPEN_BLAS_AND_LAPACKE=1 -DHAVE_LAPACK_CONFIG_H \
  -I"$SRC/framework/include" \
  -I"$HERE/shim" \
  -I/opt/venv/lib/python3.12/site-packages/tensorflow/include/Eigen/src/misc \
  "$HERE/gen_goldens3.c" "$HERE/shim/lapacke_fix.c" \
  "$BUILD/framework/libsaf.a" \
  "$OB" -lm -o "$OUT/gen_goldens3"

cc -O2 -std=gnu99 -DSAF_USE_OPEN_BLAS_AND_LAPACKE=1 -DHAVE_LAPACK_CONFIG_H \
  -DSAF_ENABLE_TRACKER_MODULE=1 -DSAF_ENABLE_HADES_MODULE=1 \
  -I"$SRC/framework/include" \
  -I"$SRC/framework/modules/saf_tracker" \
  -I"$HERE/shim" \
  -I/opt/venv/lib/python3.12/site-packages/tensorflow/include/Eigen/src/misc \
  "$HERE/gen_goldens4.c" "$HERE/shim/lapacke_fix.c" \
  "$BUILD/framework/libsaf.a" \
  "$OB" -lm -o "$OUT/gen_goldens4"

cc -O2 -std=gnu99 -DSAF_USE_OPEN_BLAS_AND_LAPACKE=1 -DHAVE_LAPACK_CONFIG_H \
  -DSAF_ENABLE_TRACKER_MODULE=1 -DSAF_ENABLE_HADES_MODULE=1 \
  -I"$SRC/framework/include" \
  -I"$SRC/framework/modules/saf_hades" \
  -I"$HERE/shim" \
  -I/opt/venv/lib/python3.12/site-packages/tensorflow/include/Eigen/src/misc \
  "$HERE/gen_goldens5.c" "$HERE/shim/lapacke_fix.c" \
  "$BUILD/framework/libsaf.a" \
  "$OB" -lm -o "$OUT/gen_goldens5"

cc -O2 -std=gnu99 -DSAF_USE_OPEN_BLAS_AND_LAPACKE=1 -DHAVE_LAPACK_CONFIG_H \
  -I"$SRC/framework/include" -I"$SRC/examples/include" \
  -I"$HERE/shim" \
  -I/opt/venv/lib/python3.12/site-packages/tensorflow/include/Eigen/src/misc \
  "$HERE/gen_goldens6.c" "$HERE/shim/lapacke_fix.c" \
  "$BUILD/examples/libsaf_example_ambi_drc.a" \
  "$BUILD/framework/libsaf.a" \
  "$OB" -lm -o "$OUT/gen_goldens6"

cc -O2 -std=gnu99 -DSAF_USE_OPEN_BLAS_AND_LAPACKE=1 -DHAVE_LAPACK_CONFIG_H \
  -I"$SRC/framework/include" -I"$SRC/examples/include" \
  -I"$SRC/examples/src/array2sh" \
  -I"$HERE/shim" \
  -I/opt/venv/lib/python3.12/site-packages/tensorflow/include/Eigen/src/misc \
  "$HERE/gen_goldens7.c" "$HERE/shim/lapacke_fix.c" \
  "$BUILD/examples/libsaf_example_array2sh.a" \
  "$BUILD/examples/libsaf_example_panner.a" \
  "$BUILD/examples/libsaf_example_powermap.a" \
  "$BUILD/examples/libsaf_example_sldoa.a" \
  "$BUILD/examples/libsaf_example_spreader.a" \
  "$BUILD/framework/libsaf.a" \
  "$OB" -lm -o "$OUT/gen_goldens7"

cc -O2 -std=gnu99 -DSAF_USE_OPEN_BLAS_AND_LAPACKE=1 -DHAVE_LAPACK_CONFIG_H \
  -I"$SRC/framework/include" -I"$SRC/examples/include" \
  -I"$HERE/shim" \
  -I/opt/venv/lib/python3.12/site-packages/tensorflow/include/Eigen/src/misc \
  "$HERE/gen_goldens8.c" "$HERE/shim/lapacke_fix.c" \
  "$SRC/examples/src/roombinauraliser/roombinauraliser.c" \
  "$SRC/examples/src/roombinauraliser/roombinauraliser_internal.c" \
  "$BUILD/examples/libsaf_example_ambi_enc.a" \
  "$BUILD/examples/libsaf_example_rotator.a" \
  "$BUILD/examples/libsaf_example_beamformer.a" \
  "$BUILD/examples/libsaf_example_ambi_dec.a" \
  "$BUILD/examples/libsaf_example_dirass.a" \
  "$BUILD/framework/libsaf.a" \
  "$OB" -lm -o "$OUT/gen_goldens8"

cc -O2 -std=gnu99 -DSAF_USE_OPEN_BLAS_AND_LAPACKE=1 -DHAVE_LAPACK_CONFIG_H \
  -I"$SRC/framework/include" -I"$SRC/examples/include" \
  -I"$HERE/shim" \
  -I/opt/venv/lib/python3.12/site-packages/tensorflow/include/Eigen/src/misc \
  "$HERE/gen_goldens9.c" "$HERE/shim/lapacke_fix.c" \
  "$BUILD/examples/libsaf_example_binauraliser_nf.a" \
  "$BUILD/examples/libsaf_example_decorrelator.a" \
  "$BUILD/examples/libsaf_example_ambi_roomsim.a" \
  "$BUILD/framework/libsaf.a" \
  "$OB" -lm -o "$OUT/gen_goldens9"

cc -O2 -std=gnu99 -DSAF_USE_OPEN_BLAS_AND_LAPACKE=1 -DHAVE_LAPACK_CONFIG_H \
  -I"$SRC/framework/include" \
  -I"$HERE/shim" \
  -I/opt/venv/lib/python3.12/site-packages/tensorflow/include/Eigen/src/misc \
  "$HERE/gen_goldens10.c" "$HERE/shim/lapacke_fix.c" \
  "$BUILD/framework/libsaf.a" \
  "$OB" -lm -o "$OUT/gen_goldens10"

cc -O2 -std=gnu99 -DSAF_USE_OPEN_BLAS_AND_LAPACKE=1 -DHAVE_LAPACK_CONFIG_H \
  -I"$SRC/framework/include" -I"$SRC/examples/include" \
  -I"$HERE/shim" \
  -I/opt/venv/lib/python3.12/site-packages/tensorflow/include/Eigen/src/misc \
  "$HERE/gen_goldens11.c" "$HERE/shim/lapacke_fix.c" \
  "$BUILD/examples/libsaf_example_decorrelator.a" \
  "$BUILD/framework/libsaf.a" \
  "$OB" -lm -o "$OUT/gen_goldens11"

cc -O2 -std=gnu99 -DSAF_USE_OPEN_BLAS_AND_LAPACKE=1 -DHAVE_LAPACK_CONFIG_H \
  -I"$SRC/framework/include" -I"$SRC/examples/include" \
  -I"$HERE/shim" \
  -I/opt/venv/lib/python3.12/site-packages/tensorflow/include/Eigen/src/misc \
  "$HERE/gen_goldens12.c" "$HERE/shim/lapacke_fix.c" \
  "$BUILD/examples/libsaf_example_binauraliser.a" \
  "$BUILD/examples/libsaf_example_powermap.a" \
  "$BUILD/examples/libsaf_example_ambi_bin.a" \
  "$BUILD/examples/libsaf_example_dirass.a" \
  "$BUILD/framework/libsaf.a" \
  "$OB" -lm -o "$OUT/gen_goldens12"

cc -O2 -std=gnu99 -DSAF_USE_OPEN_BLAS_AND_LAPACKE=1 -DHAVE_LAPACK_CONFIG_H \
  -I"$SRC/framework/include" -I"$SRC/examples/include" \
  -I"$SRC/examples/src/powermap" \
  -I"$HERE/shim" \
  -I/opt/venv/lib/python3.12/site-packages/tensorflow/include/Eigen/src/misc \
  "$HERE/gen_goldens13.c" "$HERE/shim/lapacke_fix.c" \
  "$BUILD/examples/libsaf_example_binauraliser_nf.a" \
  "$BUILD/examples/libsaf_example_powermap.a" \
  "$BUILD/examples/libsaf_example_ambi_bin.a" \
  "$BUILD/examples/libsaf_example_beamformer.a" \
  "$BUILD/framework/libsaf.a" \
  "$OB" -lm -o "$OUT/gen_goldens13"

cc -O2 -std=gnu99 -DSAF_USE_OPEN_BLAS_AND_LAPACKE=1 -DHAVE_LAPACK_CONFIG_H \
  -I"$SRC/framework/include" -I"$SRC/examples/include" \
  -I"$HERE/shim" \
  -I/opt/venv/lib/python3.12/site-packages/tensorflow/include/Eigen/src/misc \
  "$HERE/gen_goldens14.c" "$HERE/shim/lapacke_fix.c" \
  "$SRC/examples/src/roombinauraliser/roombinauraliser.c" \
  "$SRC/examples/src/roombinauraliser/roombinauraliser_internal.c" \
  "$BUILD/framework/libsaf.a" \
  "$OB" -lm -o "$OUT/gen_goldens14"

cc -O2 -std=gnu99 -DSAF_USE_OPEN_BLAS_AND_LAPACKE=1 -DHAVE_LAPACK_CONFIG_H \
  -DSAF_ENABLE_TRACKER_MODULE=1 -DSAF_ENABLE_HADES_MODULE=1 \
  -I"$SRC/framework/include" -I"$SRC/examples/include" \
  -I"$SRC/framework/modules/saf_hades" \
  -I"$HERE/shim" \
  -I/opt/venv/lib/python3.12/site-packages/tensorflow/include/Eigen/src/misc \
  "$HERE/gen_goldens15.c" "$HERE/shim/lapacke_fix.c" \
  "$BUILD/examples/libsaf_example_binauraliser.a" \
  "$BUILD/framework/libsaf.a" \
  "$OB" -lm -o "$OUT/gen_goldens15"

cc -O2 -std=gnu99 -DSAF_USE_OPEN_BLAS_AND_LAPACKE=1 -DHAVE_LAPACK_CONFIG_H \
  -I"$SRC/framework/include" -I"$SRC/examples/include" \
  -I"$HERE/shim" \
  -I/opt/venv/lib/python3.12/site-packages/tensorflow/include/Eigen/src/misc \
  -I"$SRC/examples/src/ambi_dec" \
  "$HERE/gen_goldens16.c" "$HERE/shim/lapacke_fix.c" \
  "$BUILD/examples/libsaf_example_ambi_dec.a" \
  "$BUILD/examples/libsaf_example_ambi_enc.a" \
  "$BUILD/framework/libsaf.a" \
  "$OB" -lm -o "$OUT/gen_goldens16"

LD_LIBRARY_PATH="$(dirname "$OB")" "$OUT/gen_goldens" "$OUT"
LD_LIBRARY_PATH="$(dirname "$OB")" "$OUT/gen_goldens2" "$OUT"
LD_LIBRARY_PATH="$(dirname "$OB")" "$OUT/gen_goldens3" "$OUT"
LD_LIBRARY_PATH="$(dirname "$OB")" "$OUT/gen_goldens4" "$OUT"
LD_LIBRARY_PATH="$(dirname "$OB")" "$OUT/gen_goldens5" "$OUT"
LD_LIBRARY_PATH="$(dirname "$OB")" "$OUT/gen_goldens6" "$OUT"
LD_LIBRARY_PATH="$(dirname "$OB")" "$OUT/gen_goldens7" "$OUT"
LD_LIBRARY_PATH="$(dirname "$OB")" "$OUT/gen_goldens8" "$OUT"
LD_LIBRARY_PATH="$(dirname "$OB")" "$OUT/gen_goldens9" "$OUT"
LD_LIBRARY_PATH="$(dirname "$OB")" "$OUT/gen_goldens10" "$OUT"
LD_LIBRARY_PATH="$(dirname "$OB")" "$OUT/gen_goldens11" "$OUT"
LD_LIBRARY_PATH="$(dirname "$OB")" "$OUT/gen_goldens12" "$OUT"
LD_LIBRARY_PATH="$(dirname "$OB")" "$OUT/gen_goldens13" "$OUT"
LD_LIBRARY_PATH="$(dirname "$OB")" "$OUT/gen_goldens14" "$OUT"
LD_LIBRARY_PATH="$(dirname "$OB")" "$OUT/gen_goldens15" "$OUT"
LD_LIBRARY_PATH="$(dirname "$OB")" "$OUT/gen_goldens16" "$OUT"
python "$HERE/pack_goldens.py" "$OUT" "$HERE/../../tests/goldens/c_goldens.npz"
