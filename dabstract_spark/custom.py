"""Dynamic custom-module resolution (reference ``dabstract_CUSTOM_DIR``,
/root/reference/dabstract/dataset/helpers.py:96-184 and
/root/reference/dabstract/dataprocessor/processing_chain.py:50-95).

Users point ``DABSTRACT_SPARK_CUSTOM_DIR`` (the reference's
``dabstract_CUSTOM_DIR`` is honored as a fallback spelling) at a
directory of plain python files::

    <custom_dir>/processors.py   # processor classes for ProcessingChain
    <custom_dir>/selectors.py    # selector fns for add_select
    <custom_dir>/xval.py         # fold fns for set_xval
    <custom_dir>/dbs.py          # dataset builders for dataset_factory

Every registry ``resolve()`` falls back here when a name is not
built-in, so configs can reference user code by string without any
import-side registration. Modules are cached per (path, mtime) — edits
during a session are picked up, repeated lookups are free.
"""

from __future__ import annotations

import importlib.util
import os
from typing import Any

_MODULE_CACHE: dict[tuple[str, float], Any] = {}

KINDS = ("processors", "selectors", "xval", "dbs")


def custom_dir() -> str | None:
    return os.environ.get("DABSTRACT_SPARK_CUSTOM_DIR") or os.environ.get(
        "dabstract_CUSTOM_DIR"
    )


def resolve_custom(kind: str, name: str):
    """Look up ``name`` in ``<custom_dir>/<kind>.py``; None if the env
    var is unset, the file is absent, or the attribute is missing."""
    if kind not in KINDS:
        raise ValueError(f"unknown custom kind '{kind}'; have {KINDS}")
    root = custom_dir()
    if not root:
        return None
    path = os.path.join(root, f"{kind}.py")
    if not os.path.isfile(path):
        return None
    key = (path, os.path.getmtime(path))
    mod = _MODULE_CACHE.get(key)
    if mod is None:
        spec = importlib.util.spec_from_file_location(
            f"dabstract_spark_custom_{kind}", path
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _MODULE_CACHE[key] = mod
    return getattr(mod, name, None)
