"""Refresh the committed per-query source-fingerprint snapshot
(``impuls_spark/showcase/query_hashes.json``) that makes the
correctness rotation change-aware (VERDICT r6 item 2).

The snapshot records, for each query, its fingerprint AS OF ITS LAST
driver-recorded correctness row.  Run this at ROUND START, before
editing anything: the working tree then still equals the state the
driver just judged, so updating the queries named in the latest
``CORRECTNESS_r{N}.json`` to their current fingerprints is exactly
"their driver row now reflects this source".

Usage:
    python scripts/refresh_query_hashes.py           # latest-round queries
    python scripts/refresh_query_hashes.py --all     # bootstrap: every query
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from impuls_spark.showcase import FINGERPRINTS
    from impuls_spark.showcase.ledger import (
        load_hash_snapshot,
        load_ledger,
        snapshot_path,
    )

    snap = load_hash_snapshot()
    if "--all" in sys.argv[1:]:
        targets = sorted(FINGERPRINTS)
    else:
        ledger = load_ledger()
        latest = max(ledger.values(), default=0)
        targets = sorted(
            q for q, rnd in ledger.items()
            if rnd == latest and q in FINGERPRINTS
        )
    changed = 0
    for q in targets:
        if snap.get(q) != FINGERPRINTS[q]:
            snap[q] = FINGERPRINTS[q]
            changed += 1
    # drop entries for queries that no longer exist
    stale = [q for q in snap if q not in FINGERPRINTS]
    for q in stale:
        del snap[q]
    snapshot_path().write_text(
        json.dumps(dict(sorted(snap.items())), indent=1) + "\n"
    )
    print(
        f"updated {changed}/{len(targets)} targeted fingerprints "
        f"({len(stale)} removed); snapshot now {len(snap)} entries "
        f"at {snapshot_path()}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
