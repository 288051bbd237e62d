#!/usr/bin/env bash
# Regenerate data/golden/baseline_cpp.json: build the reference C++ library
# out-of-source and measure single-core FPS on the TUM sample frame
# (protocol: BASELINE.md; reference examples/process_cloud.cpp:25-37).
set -euo pipefail
REF=${1:-/root/reference}
BUILD=${2:-/tmp/refbuild}
cmake -S "$REF" -B "$BUILD" -DCMAKE_BUILD_TYPE=Release -DBUILD_EXAMPLES=ON \
      -DBUILD_TESTS=OFF -DBUILD_PYTHON=OFF -G Ninja
ninja -C "$BUILD"
mkdir -p /tmp/refrun/sub && ln -sfn "$REF/data" /tmp/data
cd /tmp/refrun/sub && taskset -c 0 "$BUILD/examples/process_cloud" 100
