"""Every module in the repo imports cleanly.

The cheapest rot-guard there is: predict.py shipped with an ImportError
for weeks because nothing imported it (its codec dependency was folded
away in a refactor). Importing catches stale imports, syntax errors, and
top-level name errors in seconds — including in modules whose full
behavior only runs on a TPU or with real datasets.
"""

import importlib
import os
import pkgutil

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVERS = [
    "train", "validate", "predict", "serve", "bench", "__graft_entry__",
    "preprocess.preprocess_features", "preprocess.preprocess_questions",
]


def _package_modules():
    import dualvgr_tpu

    mods = []
    for m in pkgutil.walk_packages(dualvgr_tpu.__path__, prefix="dualvgr_tpu."):
        # _gather.so is a plain C library loaded via ctypes (data/native.py),
        # not a Python extension — pkgutil lists it but import can't load it
        if m.name != "dualvgr_tpu.data._gather":
            mods.append(m.name)
    return mods


@pytest.mark.parametrize("name", DRIVERS + _package_modules())
def test_module_imports(name):
    importlib.import_module(name)
