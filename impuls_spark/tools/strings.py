"""String helpers (parity: reference impuls/tools/strings.py:45-92)."""

from __future__ import annotations

import re
from collections.abc import Container


def find_non_conflicting_id(used: Container[str], wanted: str, sep: str = ":") -> str:
    """Return ``wanted`` if free, else probe ``wanted:1``, ``wanted:2``, …
    until unused (reference strings.py:72-92 probes numeric suffixes)."""
    if wanted not in used:
        return wanted
    i = 1
    while f"{wanted}{sep}{i}" in used:
        i += 1
    return f"{wanted}{sep}{i}"


_CAMEL_RE = re.compile(r"(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])")


def camel_to_snake(name: str) -> str:
    """``CamelCaseName`` -> ``camel_case_name`` (reference strings.py)."""
    return _CAMEL_RE.sub("_", name).lower()


_PORTABLE_RE = re.compile(r"^[a-z0-9_.-]+$")


def is_portable_name(name: str) -> bool:
    """True for names safe as file/path components across platforms."""
    return bool(_PORTABLE_RE.match(name))
