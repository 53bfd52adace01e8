"""Correctness-row staleness ledger.

The driver records at most 50 queries per round in ``CORRECTNESS_r{N}.json``
(observed cap, r4/r5), so registration order decides which queries get a
fresh driver-recorded correctness row.  To bound staleness — no query's
driver row should ever age more than ~2 rounds — the registration order in
:mod:`impuls_spark.showcase` is derived here as a *pure function of the
committed correctness files*: stalest first, never-recorded (new) queries
before everything else.

This replaces the r5 hand-curated priority list; the rotation is now
automatic.  Each round the driver writes a new ``CORRECTNESS_r{N}.json``,
and the next import of the showcase re-derives the order from it.
"""

from __future__ import annotations

import json
import os
import re
from pathlib import Path

__all__ = ["load_ledger", "repo_root"]

_ROUND_RE = re.compile(r"CORRECTNESS_r(\d+)\.json$")


def repo_root() -> Path:
    """Repo root holding the ``CORRECTNESS_r*.json`` files.

    Overridable with ``SPARK_GRAFT_REPO_ROOT`` for tests / installs where
    the package does not live inside the repo checkout.
    """
    env = os.environ.get("SPARK_GRAFT_REPO_ROOT")
    if env:
        return Path(env)
    return Path(__file__).resolve().parents[2]


def load_ledger(root: Path | str | None = None) -> dict[str, int]:
    """Map query name -> last round with a driver-recorded correctness row.

    Queries never recorded are absent (treated as round 0 by callers, i.e.
    maximally stale — new queries register first).  A malformed or missing
    file is skipped rather than failing the showcase import: the ledger
    degrades to "everything equally stale", which is safe (order then falls
    back to the cost-ranked tiebreak).
    """
    base = Path(root) if root is not None else repo_root()
    last: dict[str, int] = {}
    try:
        candidates = sorted(base.iterdir())
    except OSError:
        return last
    for f in candidates:
        m = _ROUND_RE.match(f.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(f.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for q in data:
            last[q] = max(last.get(q, 0), rnd)
    return last
