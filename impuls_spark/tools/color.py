"""Color helpers (parity: reference impuls/tools/color.py:56-79)."""

from __future__ import annotations


def text_color_for(background: str) -> str:
    """'000000' or 'FFFFFF', whichever contrasts better with the given
    6-hex background, using YIQ luma (the reference's formula)."""
    bg = background.lstrip("#")
    r, g, b = (int(bg[i : i + 2], 16) for i in (0, 2, 4))
    yiq = (r * 299 + g * 587 + b * 114) / 1000
    return "000000" if yiq >= 128 else "FFFFFF"
