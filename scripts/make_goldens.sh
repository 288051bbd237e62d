#!/usr/bin/env bash
# (Re)generate data/golden/*_labels.npz from the reference C++ build.
#
# The reference fetches Eigen at configure time; with no network this uses
# the Eigen 3.4 headers bundled with the tensorflow wheel via a minimal
# Eigen3Config shim. The dump harness (scripts/dump_reference_labels.cpp)
# links the reference library and writes labels CSVs, converted to npz here.
set -euo pipefail
REF=${1:-/root/reference}
BUILD=${2:-/tmp/refbuild}
REPO=$(cd "$(dirname "$0")/.." && pwd)
EIGEN_SHIM=/tmp/eigen-cmake

if [ ! -d "$EIGEN_SHIM" ]; then
  TFINC=$(python -c "import tensorflow, pathlib; print(pathlib.Path(tensorflow.__file__).parent / 'include')")
  mkdir -p "$EIGEN_SHIM"
  cat > "$EIGEN_SHIM/Eigen3Config.cmake" <<EOF
set(EIGEN3_INCLUDE_DIR "$TFINC")
if(NOT TARGET Eigen3::Eigen)
  add_library(Eigen3::Eigen INTERFACE IMPORTED)
  set_target_properties(Eigen3::Eigen PROPERTIES
    INTERFACE_INCLUDE_DIRECTORIES "\${EIGEN3_INCLUDE_DIR}")
endif()
set(Eigen3_FOUND TRUE)
set(EIGEN3_FOUND TRUE)
EOF
  cat > "$EIGEN_SHIM/Eigen3ConfigVersion.cmake" <<'EOF'
set(PACKAGE_VERSION "3.4.0")
set(PACKAGE_VERSION_COMPATIBLE TRUE)
set(PACKAGE_VERSION_EXACT FALSE)
EOF
fi

cmake -S "$REF" -B "$BUILD" -DCMAKE_BUILD_TYPE=Release -DBUILD_EXAMPLES=ON \
      -DBUILD_TESTS=OFF -DBUILD_PYTHON=OFF -DEigen3_DIR="$EIGEN_SHIM" -G Ninja
ninja -C "$BUILD"

# Build the dump harness against the built reference lib.
g++ -O2 -std=c++17 -o /tmp/dump_reference_labels "$REPO/scripts/dump_reference_labels.cpp" \
    -I"$REF/cpp/deplex/include" \
    -I"$(python -c "import tensorflow, pathlib; print(pathlib.Path(tensorflow.__file__).parent / 'include')")" \
    -L"$BUILD/lib" -ldeplex -Wl,-rpath,"$BUILD/lib"

cd "$REPO"
run() { /tmp/dump_reference_labels "$@"; }

mkdir -p /tmp/golden_csv
run data/tum/1341848230.910894.png data/configs/TUM_fr3_long_val.K \
    data/configs/TUM_fr3_long_val_ransac.ini /tmp/golden_csv/tum_ransac.csv

python - <<'EOF'
import numpy as np
labels = np.loadtxt("/tmp/golden_csv/tum_ransac.csv", dtype=np.int32)
np.savez_compressed("data/golden/tum_ransac_labels.npz", labels=labels)
print("tum_ransac_labels.npz:", labels.max(), "planes,", (labels > 0).sum(), "labeled px")
EOF
