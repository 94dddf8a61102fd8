"""Memory-bandwidth saturation probe — context for the N-vs-4N scaling number.

A CDC replay is string-shuffle heavy, i.e. memory-bound, so its core-count
scaling is capped by the box's memory bandwidth, not by the engine. This
probe measures effective copy bandwidth at increasing process counts; the
point where GB/s stops growing is the hardware ceiling past which NO
memory-bound job can scale, regardless of implementation.

    python scripts/bandwidth_probe.py          # prints GB/s at 1/2/4/8/16/32
"""

from __future__ import annotations

import multiprocessing as mp
import time

import numpy as np


_SRC = None


def _copy(_) -> float:
    # worker-persistent source buffer: allocation (200 MB of first-touch
    # page writes) happens once per worker during the WARM pass on the
    # same pool, so the timed pass covers the 10 copies only — counting
    # uncounted alloc traffic inside the timer understated GB/s, and the
    # bias grew with process count (fixed fork latency + n×200 MB).
    global _SRC
    if _SRC is None:
        _SRC = np.ones(200_000_000 // 8)  # 200 MB working set per process
        # ones, not zeros: calloc'd pages stay mapped to the kernel's
        # shared zero page until first write, so a zeros() source would
        # make every "read" a zero-page cache hit and overstate ~2x
    b = _SRC
    for _ in range(10):
        b = _SRC.copy()
    return float(b[0])


def main() -> None:
    for n in (1, 2, 4, 8, 16, 32):
        # ONE pool per n: the warm pass forks the workers and allocates
        # their persistent buffers; the timed pass reuses them
        with mp.Pool(n) as p:
            p.map(_copy, range(n))  # warm (fork + alloc + first copies)
            t0 = time.time()
            p.map(_copy, range(n))
            dt = time.time() - t0
        gb = n * 10 * 0.2 * 2  # 10 copies × 200MB × (read+write)
        print(f"procs={n:>2}: {gb / dt:6.1f} GB/s effective")


if __name__ == "__main__":
    main()
