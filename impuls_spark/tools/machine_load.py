"""Per-task wall-time and memory tracking.

Parity target: reference impuls/tools/machine_load.py:92-132 (LoadTracker
logging elapsed time + peak RSS for every pipeline task). RSS is read
from /proc/self/status (VmHWM) when available; otherwise from
resource.getrusage.
"""

from __future__ import annotations

import resource
import time


def _peak_rss_mib() -> float:
    try:
        with open("/proc/self/status") as fh:
            for line in fh:
                if line.startswith("VmHWM:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    # ru_maxrss is KiB on Linux, bytes on macOS
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


class LoadTracker:
    def __enter__(self) -> "LoadTracker":
        self.t0 = time.monotonic()
        return self

    def __exit__(self, *exc) -> None:
        self.seconds = time.monotonic() - self.t0
        self.peak_rss = _peak_rss_mib()

    def stats(self) -> dict:
        return {
            "seconds": round(getattr(self, "seconds", 0.0), 3),
            "peak_rss_mib": round(getattr(self, "peak_rss", 0.0), 1),
        }
