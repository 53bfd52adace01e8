"""Correctness-row staleness ledger + per-query source fingerprints.

The driver records at most 50 queries per round in ``CORRECTNESS_r{N}.json``
(observed cap, r4/r5), so registration order decides which queries get a
fresh driver-recorded correctness row.  To bound staleness — no query's
driver row should ever age more than ``ceil(N / 50)`` rounds (2 while the
registry held ≤100 queries; 3 at the current size, for UNCHANGED queries
only, since edited/new queries jump the queue) — the registration order in
:mod:`impuls_spark.showcase` is derived here as a *pure function of the
committed correctness files*: stalest first, never-recorded (new) queries
before everything else.

Since r7 the rotation is also CHANGE-AWARE (VERDICT r6 item 2): a round-
based ledger alone lets a query whose *code* changed this round keep a
pre-change driver row for up to two rounds.  Each query gets a source
fingerprint — a hash over the showcase callable's source, its oracle SQL,
and the source of the ``impuls_spark`` functions the callable directly
names (one level of the call graph; a change buried deeper than the
functions the wrapper names is out of scope and covered by the round
rotation) — and the committed snapshot ``query_hashes.json`` records each
query's fingerprint as of its LAST driver row.  A mismatch marks the
query modified, which outranks round-staleness in the registration order.
``scripts/refresh_query_hashes.py`` updates the snapshot for the queries
the latest correctness file just recorded (run at round start, when the
working tree still equals the state the driver judged).

This replaces the r5 hand-curated priority list; the rotation is now
automatic.  Each round the driver writes a new ``CORRECTNESS_r{N}.json``,
and the next import of the showcase re-derives the order from it.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import re
import sys
from pathlib import Path

__all__ = [
    "load_ledger",
    "repo_root",
    "load_hash_snapshot",
    "snapshot_path",
    "query_fingerprint",
]

_ROUND_RE = re.compile(r"CORRECTNESS_r(\d+)\.json$")
SNAPSHOT_NAME = "query_hashes.json"


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

    RETIRED query names (e.g. d31_budget_threshold / d54_source_cap_threshold,
    merged into their d28/d53 predecessors' families) linger in old
    CORRECTNESS_r*.json files and therefore in this map — harmless by
    construction: ``registration_order`` only ever looks up names that are
    still registered, so unregistered keys here are dead weight, not bugs
    (VERDICT r13 "what's wrong #3"). Do not chase them.
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


def snapshot_path() -> Path:
    """The committed fingerprint snapshot, next to this module."""
    return Path(__file__).resolve().parent / SNAPSHOT_NAME


def load_hash_snapshot(path: Path | str | None = None) -> dict[str, str]:
    """query name -> fingerprint as of its last driver-recorded row.

    Missing or malformed snapshot degrades to ``{}`` — every query then
    counts as modified, which collapses the order back to the plain
    round-staleness rotation (safe bootstrap)."""
    p = Path(path) if path is not None else snapshot_path()
    try:
        data = json.loads(p.read_text())
    except (OSError, ValueError):
        return {}
    if not isinstance(data, dict):
        return {}
    return {str(k): str(v) for k, v in data.items()}


def _source_of(obj) -> str | None:
    try:
        return inspect.getsource(obj)
    except (OSError, TypeError):
        return None


def query_fingerprint(fn, oracle_sql: str | None) -> str:
    """Hash of the query's observable source: the callable itself, its
    oracle SQL, and the source of every ``impuls_spark`` function or
    method the callable's code directly names — resolved through the
    defining module's globals and, for ``module.attr`` references,
    through any package submodules the callable names."""
    parts = [_source_of(fn) or repr(fn), oracle_sql or ""]
    code = getattr(fn, "__code__", None)
    mod = sys.modules.get(getattr(fn, "__module__", ""), None)
    if code is not None and mod is not None:
        names = sorted(set(code.co_names))
        submodules = []
        for name in names:
            obj = getattr(mod, name, None)
            if obj is None:
                continue
            home = inspect.getmodule(obj)
            if home is None or not (home.__name__ or "").startswith(
                "impuls_spark"
            ):
                continue
            if inspect.ismodule(obj):
                submodules.append(obj)
            elif callable(obj):
                src = _source_of(obj)
                if src:
                    parts.append(src)
        for sub in submodules:
            for name in names:
                obj = getattr(sub, name, None)
                if obj is not None and callable(obj) and not inspect.ismodule(
                    obj
                ):
                    src = _source_of(obj)
                    if src:
                        parts.append(src)
    return hashlib.md5("\x00".join(parts).encode()).hexdigest()
