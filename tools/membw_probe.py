"""Aggregate memory-bandwidth probe (the claim job's scaling ceiling).

The two-phase claim is sort/shuffle — i.e. memory-bandwidth — heavy, so
its thread-scaling ceiling is set by how aggregate DRAM bandwidth grows
with worker count, not by core count. Each worker memcpy's a 256 MiB
buffer (≈ one shuffle partition's working set at bench scale) for ~2 s;
reported GB/s counts read+write traffic. Run alone (no Spark jobs).

Measured on the sandbox box 2026-08-16 (load avg ~1.6):

    {"1": 15.5, "2": 34.1, "4": 67.7, "8": 131.0, "16": 185.7, "32": 207.2}

→ bandwidth grows 8→32 workers by only 207/131 = 1.58×, so a PURELY
bandwidth-bound job has an 8→32 efficiency ceiling of 1.58/4 = 0.40 on
this box — below even the pure-CPU SMT ceiling of ~0.72. Any sort-heavy
job lands between the two; see BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time


def worker(q, dur: float = 2.0, mb: int = 256) -> None:
    import numpy as np

    src = np.frombuffer(bytearray(mb << 20), dtype=np.uint8)
    dst = np.empty_like(src)
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < dur:
        np.copyto(dst, src)
        n += 1
    dt = time.perf_counter() - t0
    q.put(2 * n * len(src) / dt / 1e9)  # read + write bytes


def measure(levels: tuple[int, ...] = (1, 2, 4, 8, 16, 32)) -> dict[int, float]:
    """Aggregate GB/s per worker count (importable — scaling_bench embeds
    the 8/32 pair as ceiling telemetry in BENCH/scaling.json)."""
    out = {}
    for procs in levels:
        q: mp.Queue = mp.Queue()
        ps = [mp.Process(target=worker, args=(q,)) for _ in range(procs)]
        for p in ps:
            p.start()
        vals = [q.get() for _ in ps]
        for p in ps:
            p.join()
        out[procs] = round(sum(vals), 1)
    return out


def main() -> None:
    print(json.dumps(measure()))


if __name__ == "__main__":
    main()
