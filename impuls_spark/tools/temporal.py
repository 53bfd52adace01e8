"""Date-range algebra and schedule-year helpers (driver-side, Spark-free).

Parity target: reference impuls/tools/temporal.py:11-646 — a closed
5-variant algebra (empty / unbounded / left-open / right-open / bounded)
with union, intersection, difference, subset/disjoint tests, iteration
and weekday compression, plus the European-railway "schedule year"
(starting the second Saturday of December).

This is a fresh implementation of the same semantics on one normalized
representation: ``start``/``end`` are inclusive ``date`` bounds, ``None``
meaning unbounded on that side, with a dedicated EMPTY singleton.
"""

from __future__ import annotations

import datetime
from collections.abc import Iterator
from dataclasses import dataclass

_ONE_DAY = datetime.timedelta(days=1)
_MIN = datetime.date.min
_MAX = datetime.date.max


@dataclass(frozen=True)
class DateRange:
    """Inclusive date interval; ``None`` bounds mean unbounded.

    ``DateRange.EMPTY`` is the canonical empty range (start > end).

    >>> r = DateRange.bounded(datetime.date(2026, 1, 1), datetime.date(2026, 1, 10))
    >>> len(list(r))
    10
    >>> r.intersection(DateRange.left_open(datetime.date(2026, 1, 8)))
    DateRange(start=datetime.date(2026, 1, 1), end=datetime.date(2026, 1, 8))
    """

    start: datetime.date | None = None
    end: datetime.date | None = None

    EMPTY: "DateRange" = None  # type: ignore[assignment]  # set below

    # -- constructors ---------------------------------------------------

    @staticmethod
    def empty() -> "DateRange":
        return DateRange.EMPTY

    @staticmethod
    def infinite() -> "DateRange":
        return DateRange(None, None)

    @staticmethod
    def left_open(end: datetime.date) -> "DateRange":
        """All dates up to and including ``end``."""
        return DateRange(None, end)

    @staticmethod
    def right_open(start: datetime.date) -> "DateRange":
        """All dates from ``start`` onward."""
        return DateRange(start, None)

    @staticmethod
    def bounded(start: datetime.date, end: datetime.date) -> "DateRange":
        if start > end:
            return DateRange.EMPTY
        return DateRange(start, end)

    # -- basics ---------------------------------------------------------

    def is_empty(self) -> bool:
        s, e = self._lo(), self._hi()
        return s > e

    def _lo(self) -> datetime.date:
        return self.start if self.start is not None else _MIN

    def _hi(self) -> datetime.date:
        return self.end if self.end is not None else _MAX

    def __contains__(self, d: datetime.date) -> bool:
        return self._lo() <= d <= self._hi()

    def __iter__(self) -> Iterator[datetime.date]:
        if self.is_empty():
            return
        if self.start is None or self.end is None:
            raise ValueError("cannot iterate an unbounded DateRange")
        d = self.start
        while d <= self.end:
            yield d
            d += _ONE_DAY

    def __len__(self) -> int:
        if self.is_empty():
            return 0
        if self.start is None or self.end is None:
            raise ValueError("unbounded DateRange has no length")
        return (self.end - self.start).days + 1

    # -- algebra --------------------------------------------------------

    def intersection(self, other: "DateRange") -> "DateRange":
        if self.is_empty() or other.is_empty():
            return DateRange.EMPTY
        lo = max(self._lo(), other._lo())
        hi = min(self._hi(), other._hi())
        if lo > hi:
            return DateRange.EMPTY
        return DateRange(None if lo == _MIN else lo, None if hi == _MAX else hi)

    def union(self, other: "DateRange") -> "DateRange":
        """Union of overlapping or adjacent ranges; raises on disjoint
        non-adjacent inputs (the closed algebra has no gaps)."""
        if self.is_empty():
            return other
        if other.is_empty():
            return self
        a, b = sorted((self, other), key=lambda r: r._lo())
        if b._lo() > a._hi() and (a._hi() == _MAX or b._lo() > a._hi() + _ONE_DAY):
            raise ValueError(f"union of disjoint ranges: {a} | {b}")
        lo = min(a._lo(), b._lo())
        hi = max(a._hi(), b._hi())
        return DateRange(None if lo == _MIN else lo, None if hi == _MAX else hi)

    def difference(self, other: "DateRange") -> "list[DateRange]":
        """Self minus other — 0, 1 or 2 pieces."""
        if self.is_empty():
            return []
        inter = self.intersection(other)
        if inter.is_empty():
            return [self]
        pieces: list[DateRange] = []
        if inter._lo() > self._lo():
            pieces.append(DateRange(self.start, inter._lo() - _ONE_DAY))
        if inter._hi() < self._hi():
            pieces.append(DateRange(inter._hi() + _ONE_DAY, self.end))
        return pieces

    def issubset(self, other: "DateRange") -> bool:
        if self.is_empty():
            return True
        if other.is_empty():
            return False
        return other._lo() <= self._lo() and self._hi() <= other._hi()

    def isdisjoint(self, other: "DateRange") -> bool:
        return self.intersection(other).is_empty()

    # -- weekday helpers ------------------------------------------------

    @staticmethod
    def compressed_weekdays(dates: "list[datetime.date]") -> int:
        """Bitset of weekdays present (bit 0 = Monday ... bit 6 = Sunday),
        matching the reference's compressed_weekdays."""
        out = 0
        for d in dates:
            out |= 1 << d.weekday()
        return out


# EMPTY is one canonical instance with start > end so every predicate
# treats it uniformly (plain class-attribute assignment: frozen=True
# only guards instances, not the class object)
DateRange.EMPTY = DateRange(datetime.date(2, 1, 2), datetime.date(2, 1, 1))


def _second_saturday_of_december(y: int) -> datetime.date:
    d = datetime.date(y, 12, 1)
    first_sat = d + datetime.timedelta(days=(5 - d.weekday()) % 7)
    return first_sat + datetime.timedelta(days=7)


def european_schedule_year(year: int) -> DateRange:
    """The European railway schedule revision ``(year-1)-(year)``: the
    revision switches at midnight *after* the 2nd Saturday of December,
    so it runs from the Sunday after the 2nd Saturday of December of
    ``year-1`` through the 2nd Saturday of December of ``year``,
    inclusive (reference temporal.py:610-646: 2025-12-13 is still
    '2024-2025'; 2025-12-14 starts '2025-2026').

    >>> european_schedule_year(2026).start
    datetime.date(2025, 12, 14)
    >>> european_schedule_year(2026).end
    datetime.date(2026, 12, 12)
    """
    start = _second_saturday_of_december(year - 1) + _ONE_DAY
    end = _second_saturday_of_december(year)
    return DateRange.bounded(start, end)


def european_schedule_revision(for_day: datetime.date | None = None) -> str:
    """Name of the yearly European railway schedule revision active on
    ``for_day`` (default today), as ``"<live-year>-<live-year+1>"``
    (reference temporal.py:610-646).

    >>> european_schedule_revision(datetime.date(2025, 12, 13))
    '2024-2025'
    >>> european_schedule_revision(datetime.date(2025, 12, 14))
    '2025-2026'
    >>> european_schedule_revision(datetime.date(2024, 12, 15))
    '2024-2025'
    """
    for_day = for_day or datetime.date.today()
    base_year = for_day.year - 1
    if for_day.month == 12 and for_day > _second_saturday_of_december(for_day.year):
        base_year = for_day.year
    return f"{base_year}-{base_year + 1}"
