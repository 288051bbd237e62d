#!/usr/bin/env bash
# Wheel build (parity with the reference's tools/linux-wheels.sh, which loops
# CPython versions + auditwheel for the compiled extension). The native host
# runtime (libdeplex_native.so, ctypes-bound C++) is PRE-COMPILED here and
# baked into the wheel so installs need no toolchain; the compile-on-import
# path remains as a fallback for source installs. The ctypes ABI is
# interpreter-independent, so one wheel covers all CPython versions.
set -euo pipefail
cd "$(dirname "$0")/.."

# Bake the native runtime into the package tree (same compiler line as
# deplex_tpu/native/__init__.py:_build).
g++ -O3 -shared -fPIC -std=c++17 \
    deplex_tpu/native/src/deplex_native.cpp \
    deplex_tpu/native/src/deplex_loader.cpp \
    -o deplex_tpu/native/src/libdeplex_native.so -lz -pthread

# --no-build-isolation: use the environment's setuptools (works offline).
python -m pip wheel . --no-deps --no-build-isolation -w dist/
ls -l dist/
# Verify the .so is inside the wheel.
python - <<'EOF'
import glob
import zipfile

wheel = sorted(glob.glob("dist/deplex_tpu-*.whl") + glob.glob("dist/deplex-tpu-*.whl"))[-1]
names = zipfile.ZipFile(wheel).namelist()
assert any(n.endswith("libdeplex_native.so") for n in names), names
print(f"{wheel}: native runtime baked in OK")
EOF
