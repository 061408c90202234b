#!/usr/bin/env bash
# CI analogue of the reference's build workflow
# (/root/reference/.github/workflows/main.yml:1-61: install -> build ->
# deploy).  The rebuild's equivalent: hermetic quick test lane (one
# golden/parity test per engine + the multi-chip dryrun smoke, all on an
# 8-virtual-device CPU mesh) followed by a wheel build.  Runs green on any
# machine without a TPU:
#
#   bash scripts/ci.sh
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== quick test lane (pytest -m quick) =="
python -m pytest tests/ -m quick -q

echo "== wheel build =="
python -m pip wheel --no-deps --no-build-isolation -w dist . \
  || python -m pip wheel --no-deps -w dist .
ls -l dist/*.whl | tail -1

echo "CI OK"
