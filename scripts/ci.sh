#!/usr/bin/env bash
# Two-tier CI: quick smoke first for fast failure, then the slow tier ONLY
# (tier 2 no longer re-runs the quick tests — together the tiers cover the
# whole suite exactly once). Both tiers run on an 8-virtual-device CPU mesh
# — no TPU needed (tests/conftest.py pins the platform) — and share the
# repo-local persistent XLA compile cache (.jax_cache_cpu), which makes
# warm re-runs several times faster (the suite is compile-dominated).
#
# CI_WORKERS=N parallelizes a tier with pytest-xdist on multicore hosts;
# the default is serial because the reference CI box has one core (xdist
# workers would just thrash it).
set -euo pipefail
cd "$(dirname "$0")/.."

XDIST=()
if [ "${CI_WORKERS:-1}" -gt 1 ]; then
  XDIST=(-n "$CI_WORKERS")
fi

echo "=== tier 1: quick (pytest -m 'not slow') ==="
python -m pytest -m "not slow" -q "${XDIST[@]}"

echo "=== tier 2: slow tier (pytest -m slow) ==="
python -m pytest -m slow -q "${XDIST[@]}"
