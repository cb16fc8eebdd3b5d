#!/usr/bin/env bash
# Two-tier CI: quick smoke (< 2 min) first for fast failure, then the full
# suite (torch parity, full-model trajectories, e2e extraction, 2-process
# multi-host). Both tiers run on an 8-virtual-device CPU mesh — no TPU
# needed (tests/conftest.py pins the platform).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== tier 1: quick (pytest -m 'not slow') ==="
python -m pytest -m "not slow" -q

echo "=== tier 2: full suite ==="
python -m pytest -q
