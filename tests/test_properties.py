"""Property-based tests (hypothesis) for the pure algebra layers.

The reference relies on doctests + exhaustive unit tests; property tests
cover the same invariants with generated inputs: GTFS time roundtrip,
DateRange algebra laws, YIQ contrast totality, id-conflict probing.
Spark-free — these run in milliseconds.
"""

from __future__ import annotations

import datetime

from hypothesis import given, settings, strategies as st

from impuls_spark.tools.color import text_color_for
from impuls_spark.tools.strings import camel_to_snake, find_non_conflicting_id
from impuls_spark.tools.temporal import DateRange

dates = st.dates(
    min_value=datetime.date(1990, 1, 1), max_value=datetime.date(2100, 1, 1)
)


def _rng(draw_start: datetime.date, length: int) -> DateRange:
    return DateRange.bounded(
        draw_start, draw_start + datetime.timedelta(days=length)
    )


ranges = st.builds(_rng, dates, st.integers(min_value=0, max_value=400))


@settings(max_examples=200, deadline=None)
@given(ranges, ranges)
def test_intersection_commutative_and_subset(a: DateRange, b: DateRange):
    inter = a.intersection(b)
    assert inter == b.intersection(a)
    assert inter.issubset(a) and inter.issubset(b)
    assert a.isdisjoint(b) == inter.is_empty()


@settings(max_examples=200, deadline=None)
@given(ranges, ranges)
def test_difference_partitions_range(a: DateRange, b: DateRange):
    """difference + intersection reassemble the original day set."""
    pieces = a.difference(b)
    inter = a.intersection(b)
    day_count = sum(len(p) for p in pieces) + len(inter) if not inter.is_empty() else sum(
        len(p) for p in pieces
    )
    assert day_count == len(a)
    for p in pieces:
        assert p.issubset(a)
        assert p.isdisjoint(b)


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=500_000))
def test_gtfs_time_roundtrip_scalar(secs: int):
    """format -> parse is the identity for any second count (incl. >24h),
    mirrored by the Spark expressions (oracle q19 checks those)."""
    h, m, s = secs // 3600, secs % 3600 // 60, secs % 60
    text = f"{h:02d}:{m:02d}:{s:02d}"
    parts = text.split(":")
    assert int(parts[0]) * 3600 + int(parts[1]) * 60 + int(parts[2]) == secs


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=0xFFFFFF))
def test_text_color_total(rgb: int):
    out = text_color_for(f"{rgb:06X}")
    assert out in ("000000", "FFFFFF")


@settings(max_examples=100, deadline=None)
@given(st.sets(st.text(alphabet="ab:123", max_size=6), max_size=30),
       st.text(alphabet="ab", min_size=1, max_size=4))
def test_find_non_conflicting_id(used: set, wanted: str):
    out = find_non_conflicting_id(used, wanted)
    assert out not in used
    assert out == wanted or out.startswith(wanted + ":")


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(whitelist_categories=("Lu", "Ll")), max_size=12))
def test_camel_to_snake_idempotent_lowercase(name: str):
    out = camel_to_snake(name)
    assert out == out.lower()
    assert camel_to_snake(out) == out


# -- GTFS CSV quoting (gtfs_write._csv_quote) -------------------------------

@settings(max_examples=300, deadline=None)
@given(st.lists(st.text(max_size=20), min_size=1, max_size=6))
def test_csv_quote_roundtrip(fields: list):
    """A header/row serialized with _csv_quote parses back verbatim
    under the standard csv reader — for ANY field content, including
    embedded quotes, commas, and newlines (save.rs quoting parity)."""
    import csv
    import io

    from hypothesis import assume

    from impuls_spark.sources.gtfs_write import _csv_quote

    # a single empty field serializes to an empty LINE, which CSV
    # defines as "no fields" — the one inherent format ambiguity (GTFS
    # headers are never empty, so the writer can't hit it)
    assume(fields != [""])
    line = ",".join(_csv_quote(f) for f in fields)
    parsed = next(csv.reader(io.StringIO(line + "\n")))
    assert parsed == fields


# -- MultiFile version pruning (prune_outdated_feeds) -----------------------

feed_dates = st.lists(dates, min_size=1, max_size=10, unique=True)


@settings(max_examples=200, deadline=None)
@given(feed_dates, dates)
def test_prune_outdated_feeds_laws(starts: list, today: datetime.date):
    from impuls_spark.multi_file import IntermediateFeed, prune_outdated_feeds
    from impuls_spark.resource import LocalResource

    feeds = [
        IntermediateFeed(LocalResource("/dev/null"), version=str(d),
                         start_date=d)
        for d in starts
    ]
    kept = prune_outdated_feeds(feeds, today)
    kept_starts = [f.start_date for f in kept]
    # sorted, unique, subset of the input
    assert kept_starts == sorted(kept_starts)
    assert set(kept_starts) <= set(starts)
    # every feed starting after today survives
    assert {d for d in starts if d > today} <= set(kept_starts)
    # plus exactly the latest feed active on/before today, if one exists
    active = [d for d in starts if d <= today]
    if active:
        assert max(active) in kept_starts
        assert len(kept_starts) == len([d for d in starts if d > today]) + 1
    else:
        assert len(kept_starts) == len(starts)


# ---------------------------------------------------------------------------
# BPE tokenizer core (pure driver-side algebra — Spark-free)
# ---------------------------------------------------------------------------

from impuls_spark.llm.tokenizer import (  # noqa: E402
    EOW,
    _encode_word,
    train_from_frequencies,
)

words = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=0x2FFF,
                           blacklist_characters=EOW),
    min_size=1, max_size=12,
)
vocabs = st.dictionaries(words, st.integers(1, 50), min_size=1, max_size=15)


@settings(max_examples=150, deadline=None)
@given(vocabs, st.integers(0, 40))
def test_bpe_encode_concat_reconstructs(vocab: dict, n_merges: int):
    """Applying ANY learned merge list never loses or reorders bytes:
    the encoded symbols concatenate back to word + EOW."""
    merges = train_from_frequencies(vocab, n_merges)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in vocab:
        assert "".join(_encode_word(w, ranks)) == w + EOW


@settings(max_examples=100, deadline=None)
@given(vocabs, st.integers(0, 40))
def test_bpe_train_deterministic_and_bounded(vocab: dict, n_merges: int):
    m1 = train_from_frequencies(dict(vocab), n_merges)
    m2 = train_from_frequencies(dict(reversed(list(vocab.items()))), n_merges)
    assert m1 == m2  # insertion order of the vocab must not matter
    assert len(m1) <= n_merges
    assert len(set(m1)) == len(m1)  # a pair is merged at most once


@settings(max_examples=100, deadline=None)
@given(vocabs)
def test_bpe_enough_merges_collapse_every_word(vocab: dict):
    """With an unbounded merge budget every training word becomes ONE
    symbol — the loop provably runs to fixpoint."""
    total = sum(len(w) + 1 for w in vocab)
    merges = train_from_frequencies(vocab, total)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in vocab:
        assert _encode_word(w, ranks) == [w + EOW]
