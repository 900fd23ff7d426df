"""Data-path configuration.

Parity reference: /root/reference/src/core/coretypes/parameters.cc — the
ARTS_DATA_PATH / ARTS_XML_DATA_DIR / ARTS_CAT_DATA_DIR search-path
environment variables (ArtsTestcases.cmake:50-52).  The same variables are
honored here so existing data layouts keep working.
"""

import os
import pathlib

ENV_VARS = ("ARTS_DATA_PATH", "ARTS_XML_DATA_DIR", "ARTS_CAT_DATA_DIR")


def search_paths():
    paths = []
    for var in ENV_VARS:
        val = os.environ.get(var)
        if val:
            paths.extend(pathlib.Path(p) for p in val.split(":") if p)
    paths.append(pathlib.Path.home() / ".cache" / "arts")
    return paths


def find_data(relpath):
    """Locate a data file under the configured search paths."""
    for base in search_paths():
        cand = base / relpath
        if cand.exists():
            return cand
    raise FileNotFoundError(
        f"{relpath} not found under {[str(p) for p in search_paths()]} "
        f"(set one of {ENV_VARS})"
    )
