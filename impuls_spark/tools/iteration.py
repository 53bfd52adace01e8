"""Iteration helpers (parity: reference impuls/tools/iteration.py:10-36)."""

from __future__ import annotations

import itertools
from collections.abc import Iterable, Iterator
from typing import TypeVar

T = TypeVar("T")


def limit(it: Iterable[T], n: int) -> Iterator[T]:
    """First ``n`` elements of ``it``."""
    return itertools.islice(it, n)


def walk_len(it: Iterable) -> int:
    """Consume ``it`` and return how many elements it yielded."""
    return sum(1 for _ in it)
