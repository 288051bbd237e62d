#!/usr/bin/env bash
# Wheel build (parity with the reference's tools/linux-wheels.sh, which loops
# CPython versions + auditwheel for the compiled extension). deplex-tpu's
# native piece is compiled at runtime via ctypes, so the wheel is pure-python
# and one build covers all interpreters.
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pip wheel . --no-deps -w dist/
ls -l dist/
