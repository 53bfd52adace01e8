"""Registration-order rotation (VERDICT r5 item 1) and bench-order
tail discipline (item 7).

The driver records only the first 50 registered queries per round, so
the showcase must register the stalest driver rows first.  Since r6 the
order is derived from the committed ``CORRECTNESS_r*.json`` files
(:mod:`impuls_spark.showcase.ledger`); these tests pin the invariants so
a refactor can't silently restore a hand-curated (and rotting) order.
"""

from __future__ import annotations

import json

from impuls_spark.showcase import (
    BENCH_ORDER,
    LEDGER,
    MODIFIED,
    ORACLES,
    QUERIES,
)
from impuls_spark.showcase.ledger import load_ledger, repo_root

DRIVER_CAP = 50


def test_ledger_matches_committed_correctness_files():
    root = repo_root()
    files = sorted(root.glob("CORRECTNESS_r*.json"))
    assert files, "CORRECTNESS_r*.json files must exist at repo root"
    expect: dict[str, int] = {}
    for f in files:
        rnd = int(f.stem.split("_r")[1])
        for q in json.loads(f.read_text()):
            expect[q] = max(expect.get(q, 0), rnd)
    assert load_ledger() == expect


def test_registration_is_modified_then_stalest_first():
    """Modified-since-last-driver-row queries lead (VERDICT r6 item 2);
    within each of the modified / unmodified groups the order is
    non-decreasing in last-recorded round."""
    order = list(QUERIES)
    flags = [q in MODIFIED for q in order]
    assert flags == sorted(flags, reverse=True), (
        "every modified query must register before every unmodified one"
    )
    for group in (True, False):
        rounds = [LEDGER.get(q, 0) for q in order if (q in MODIFIED) == group]
        assert rounds == sorted(rounds), (
            "registration order must be non-decreasing in last-recorded "
            f"round within the modified={group} group"
        )


def test_driver_cap_covers_every_stalest_query():
    """Among unmodified queries, anyone at least as stale as a query
    outside the first 50 slots must itself be inside them — the cap
    never skips a staler row (modified queries legitimately jump it)."""
    order = list(QUERIES)
    inside, outside = order[:DRIVER_CAP], order[DRIVER_CAP:]
    if not outside:
        return
    assert not any(q in MODIFIED for q in outside), (
        "a modified query fell outside the driver cap"
    )
    max_inside = max(
        (LEDGER.get(q, 0) for q in inside if q not in MODIFIED), default=0
    )
    assert all(LEDGER.get(q, 0) >= max_inside for q in outside), (
        "a query outside the driver cap is staler than one inside it"
    )


def test_staleness_bound_ceil_rounds():
    """Stalest-first rotation re-greens every driver row within
    ``ceil(N / 50)`` rounds: each round retires the 50 stalest, so no
    row can be skipped more than ``N/50 − 1`` consecutive times. At
    ≤100 queries this was the 2-round bound the r5/r6 verdicts pinned;
    past 100 the bound is 3 rounds FOR UNCHANGED QUERIES ONLY —
    edited or new queries always jump the queue (change-aware
    priority, test above), and an unchanged deterministic query over
    fixed testdata cannot drift between re-greens. Keep the bound
    from silently growing past 3: that would mean sharding the
    registration is overdue."""
    import math

    bound = math.ceil(len(QUERIES) / DRIVER_CAP)
    assert bound <= 3, (
        f"{len(QUERIES)} queries -> {bound}-round staleness; "
        "shard the registration"
    )


def test_modified_query_always_lands_in_driver_window():
    """The VERDICT r6 item-2 contract: a query edited this round —
    even one whose driver row is from the LATEST round (maximally
    fresh, last under round-only rotation) — registers in the top 50
    once its fingerprint diverges from the snapshot."""
    from impuls_spark.showcase import registration_order

    latest = max(LEDGER.values(), default=0)
    freshest = [q for q in QUERIES if LEDGER.get(q, 0) == latest]
    assert freshest, "ledger must have latest-round rows"
    victim = freshest[-1]
    order = registration_order(LEDGER, {victim})
    assert order.index(victim) < DRIVER_CAP


def test_fingerprint_tracks_named_callee_source(tmp_path):
    """The fingerprint must change when a library function the query
    names changes its source — not only when the wrapper changes."""
    import impuls_spark.showcase.ledger as L

    import importlib.util

    def load(fname: str, body: str):
        # distinct filenames: inspect.getsource goes through linecache,
        # which would serve stale lines for a rewritten same-name file
        src = tmp_path / fname
        src.write_text(body)
        spec = importlib.util.spec_from_file_location("impuls_spark._fp_tmp",
                                                      src)
        m = importlib.util.module_from_spec(spec)
        import sys as _s
        _s.modules["impuls_spark._fp_tmp"] = m
        spec.loader.exec_module(m)
        return m

    query_src = "def query(spark, sf):\n    return helper()\n"
    m1 = load("fp_mod1.py", "def helper():\n    return 1\n\n" + query_src)
    fp1 = L.query_fingerprint(m1.query, "SELECT 1")
    m2 = load("fp_mod2.py", "def helper():\n    return 2\n\n" + query_src)
    fp2 = L.query_fingerprint(m2.query, "SELECT 1")
    assert fp1 != fp2, "callee source change must move the fingerprint"
    fp3 = L.query_fingerprint(m2.query, "SELECT 2")
    assert fp3 != fp2, "oracle SQL change must move the fingerprint"


def test_new_queries_register_first():
    never_recorded = [q for q in QUERIES if q not in LEDGER]
    order = list(QUERIES)
    for q in never_recorded:
        assert order.index(q) < DRIVER_CAP, f"new query {q} missed the cap"


def test_every_query_has_an_oracle_or_is_documented():
    missing = sorted(set(QUERIES) - set(ORACLES))
    # streaming-only / non-SQL-expressible ops may omit an oracle; keep
    # the list explicit so additions are a conscious choice.
    assert missing == [], f"queries without oracle rows: {missing}"


# --- VERDICT r5 item 7: bench tail discipline ---------------------------


def test_bench_order_heavy_tail_discipline():
    """d26's intersection stages leave executor-memory pressure that slows
    whatever runs next (measured 30-40% on d03/d14, r5); d10/d18 warm the
    shingle cache reused by d02/d03/d26.  Pin both orderings."""
    pos = {q: i for i, q in enumerate(BENCH_ORDER)}
    assert pos["d26_containment"] > pos["d03_minhash_lsh"]
    assert pos["d26_containment"] > pos["d14_dup_clusters"]
    assert pos["d26_containment"] == len(BENCH_ORDER) - 1, (
        "d26 must run last (memory-pressure shadow)"
    )
    for warm in ("d10_fingerprints", "d18_decontaminate"):
        for hot in ("d02_ngram_jaccard", "d03_minhash_lsh", "d26_containment"):
            assert pos[warm] < pos[hot], f"{warm} must precede {hot}"


def test_bench_order_is_a_permutation_of_queries():
    assert sorted(BENCH_ORDER) == sorted(QUERIES)


def test_size_scaled_granularity_is_fixed_at_oracle_sizes():
    """d56's cluster count, d13's plane count and d04's signature width
    scale with the corpus, but MUST stay at their oracle-pinned values
    for every driver-visible size (sf0.001/0.01/0.1) — a drift here
    silently changes the recorded hashes."""
    import math

    from impuls_spark.showcase.llm import _d56_k

    for n in (200, 500, 2000):
        assert _d56_k(n) == 8
    assert _d56_k(20_000) == 80
    # d13 planes: max(8, ceil(log2(n/16)))
    for n in (200, 500, 2000, 4096):
        assert max(8, math.ceil(math.log2(max(n, 16) / 16))) == 8
    assert max(8, math.ceil(math.log2(20_000 / 16))) == 11
    # d04 bits cutoff: 16 through every generated size incl. sf1
    for n in (500, 5000, 50_000, 100_000):
        assert (16 if n <= 100_000 else 32) == 16
    assert (16 if 500_000 <= 100_000 else 32) == 32
