#!/bin/bash
# Compile + run the golden generators against the built reference, then pack
# the outputs into tests/goldens/c_goldens.npz.  Requires build_ref.sh first.
set -euo pipefail

HERE="$(cd "$(dirname "$0")" && pwd)"
SRC=/tmp/saf_ref_src
BUILD=/tmp/saf_ref_build
OUT=/tmp/saf_goldens
OB=/opt/venv/lib/python3.12/site-packages/opencv_python.libs/libopenblasp-r0-59ffcd50.3.15.so

mkdir -p "$OUT"
rm -f "$OUT/manifest.txt"   # generators append; start clean

CFLAGS=(-O2 -std=gnu99 -DSAF_USE_OPEN_BLAS_AND_LAPACKE=1 -DHAVE_LAPACK_CONFIG_H
        -I"$SRC/framework/include" -I"$HERE/shim"
        -I/opt/venv/lib/python3.12/site-packages/tensorflow/include/Eigen/src/misc)
EX=(-I"$SRC/examples/include")
TRK=(-DSAF_ENABLE_TRACKER_MODULE=1 -DSAF_ENABLE_HADES_MODULE=1)
ROOMBIN=("$SRC/examples/src/roombinauraliser/roombinauraliser.c"
         "$SRC/examples/src/roombinauraliser/roombinauraliser_internal.c")

# exlib a b c → the example static libs for those names
exlib() { local n out=(); for n in "$@"; do out+=("$BUILD/examples/libsaf_example_$n.a"); done; printf '%s\n' "${out[@]}"; }

# build <suffix> [extra cc args: -I/-D flags, extra sources, example libs]
build() {
    local n="$1"; shift
    cc "${CFLAGS[@]}" "$HERE/gen_goldens$n.c" "$HERE/shim/lapacke_fix.c" \
       "$@" "$BUILD/framework/libsaf.a" "$OB" -lm -o "$OUT/gen_goldens$n"
}

build ""  "${EX[@]}" $(exlib ambi_bin)
build 2   "${EX[@]}" -I"$SRC/framework/modules/saf_reverb" $(exlib binauraliser)
build 3
build 4   "${TRK[@]}" -I"$SRC/framework/modules/saf_tracker"
build 5   "${TRK[@]}" -I"$SRC/framework/modules/saf_hades"
build 6   "${EX[@]}" $(exlib ambi_drc)
build 7   "${EX[@]}" -I"$SRC/examples/src/array2sh" \
          $(exlib array2sh panner powermap sldoa spreader)
build 8   "${EX[@]}" "${ROOMBIN[@]}" \
          $(exlib ambi_enc rotator beamformer ambi_dec dirass)
build 9   "${EX[@]}" $(exlib binauraliser_nf decorrelator ambi_roomsim)
build 10
build 11  "${EX[@]}" $(exlib decorrelator)
build 12  "${EX[@]}" -I"$SRC/examples/src/powermap" \
          -I"$SRC/examples/src/dirass" \
          $(exlib binauraliser powermap ambi_bin dirass)
build 13  "${EX[@]}" -I"$SRC/examples/src/powermap" \
          $(exlib binauraliser_nf powermap ambi_bin beamformer)
build 14  "${EX[@]}" "${ROOMBIN[@]}"
build 15  "${TRK[@]}" "${EX[@]}" -I"$SRC/framework/modules/saf_hades" \
          $(exlib binauraliser)
build 16  "${EX[@]}" -I"$SRC/examples/src/ambi_dec" \
          $(exlib ambi_dec ambi_enc panner ambi_bin)
build 17

for n in "" 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17; do
    LD_LIBRARY_PATH="$(dirname "$OB")" "$OUT/gen_goldens$n" "$OUT"
done
python "$HERE/pack_goldens.py" "$OUT" "$HERE/../../tests/goldens/c_goldens.npz"
