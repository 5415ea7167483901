#!/bin/bash
# Build the reference MedGP C++ binaries (main_one_train / main_one_test)
# in this environment with g++, using the local shims in ./shim for the
# two third-party dependencies the reference assumes (<mkl.h>, rapidjson).
#
# The reference sources are compiled IN PLACE from /root/reference (read
# only); nothing is copied into this repository. Outputs land in
# tools/refbuild/build/ (gitignored).
#
# Usage: tools/refbuild/build.sh [REF_SRC_DIR] [OUT_DIR]
set -euo pipefail

HERE="$(cd "$(dirname "$0")" && pwd)"
REF_SRC="${1:-/root/reference/medgpc/src}"
OUT="${2:-$HERE/build}"
mkdir -p "$OUT"

CXX=${CXX:-g++}
CXXFLAGS="-std=c++11 -O2 -fopenmp -fpermissive -w -I$HERE/shim -I$REF_SRC"
LDFLAGS="/usr/lib/x86_64-linux-gnu/liblapack.so.3 /usr/lib/x86_64-linux-gnu/libblas.so.3 -lgomp"

srcs=$(find "$REF_SRC" -mindepth 2 -name '*.cpp' | sort)

objs=()
for s in $srcs; do
  o="$OUT/$(basename "${s%.cpp}").o"
  if [ ! -f "$o" ] || [ "$s" -nt "$o" ]; then
    echo "CXX $(basename "$s")"
    $CXX $CXXFLAGS -c "$s" -o "$o"
  fi
  objs+=("$o")
done

echo "LINK main_one_train"
$CXX $CXXFLAGS "$REF_SRC/main_one_train.cpp" "${objs[@]}" -o "$OUT/main_one_train" $LDFLAGS
echo "LINK main_one_test"
$CXX $CXXFLAGS "$REF_SRC/main_one_test.cpp" "${objs[@]}" -o "$OUT/main_one_test" $LDFLAGS
echo "LINK nlml_probe"
$CXX $CXXFLAGS "$HERE/nlml_probe.cpp" "${objs[@]}" -o "$OUT/nlml_probe" $LDFLAGS
echo "OK: $OUT/main_one_train $OUT/main_one_test $OUT/nlml_probe"
