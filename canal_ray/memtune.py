"""Allocator tuning for balloon-reclaimed (virtualized) memory.

STATUS: OPT-IN ONLY (CANAL_MEMTUNE=1) — measured HARMFUL at scale.
An interleaved A/B on the full 24.4M-event replay (same noise window,
clean fixtures) measured:

    32 CPUs, tunables OFF:  26.9 s  (907k events/s)
    32 CPUs, tunables ON:  297.6 s  ( 82k events/s)   -- 11x slower

Root cause of the backfire: pinning every worker's heap at its high-water
mark (trim disabled, 1 GiB mmap threshold) multiplies aggregate RSS by the
worker count. At 32-way the fleet's retained heaps exceed what the
hypervisor keeps cheaply resident, re-creating the reclaim pressure the
tunables were meant to dodge — now on anonymous heap pages that can't be
dropped like page cache. The per-process fault measurements below remain
true; the fleet-level conclusion inverts them. Kept as an opt-in probe.

Original rationale (single-process measurements):

On this sandbox's hypervisor, guest pages returned to the kernel (munmap /
malloc_trim / allocator decay) are reclaimed by the host after ~10s idle and
the next first-touch faults them back at only ~10-20 MB/s per process
(measured: filling a fresh 123 MB numpy buffer costs 10-20 s cold vs 0.02 s
warm; aggregate fault throughput across 8 parallel processes is ~170 MB/s).
glibc serves every allocation >128 KiB with mmap and munmaps it on free, and
Arrow's jemalloc pool decays dirty pages after ~1 s — so a steady-state Ray
worker re-pays the fault cost on every task. At 32-way concurrency the fault
path contends globally, which is exactly the shape of the "memory wall" seen
in the 8-vs-32-CPU scaling runs.

Fix: keep pages resident.
- ``GLIBC_TUNABLES`` raises glibc's mmap/trim thresholds to 1 GiB so numpy /
  pandas buffers come from the sbrk heap and are never returned to the
  kernel (the heap's high-water mark stays faulted for the process
  lifetime). Must be exported BEFORE ``ray.init`` so raylet -> worker
  processes inherit it at exec (ld.so reads it at startup).
- ``ARROW_DEFAULT_MEMORY_POOL=system`` routes Arrow buffers through the same
  tuned glibc allocator instead of the decaying jemalloc pool.
- ``mallopt`` applies the same thresholds to the CURRENT process (whose
  ld.so already ran).

This is a single-node sandbox adaptation; on a real cluster with normal
memory management these settings are harmless (slightly higher RSS
high-water mark per worker, no correctness impact).
"""

from __future__ import annotations

import ctypes
import os

_GB = 1 << 30

# M_TRIM_THRESHOLD=-1, M_MMAP_THRESHOLD=-3 (glibc malloc.h)
_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3

_TUNABLES = (
    f"glibc.malloc.mmap_threshold={_GB}:glibc.malloc.trim_threshold={_GB}"
)


def apply_allocator_tunables() -> None:
    """Tune the current process and export env for future child processes.

    Call BEFORE ``ray.init`` (and before heavy pyarrow use) from any process
    that owns a Ray session — bench.py, CLI entry points, test fixtures.
    Library code must NOT call this implicitly; it mutates process-global
    environment.
    """
    os.environ.setdefault("GLIBC_TUNABLES", _TUNABLES)
    os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(_M_MMAP_THRESHOLD, _GB)
        libc.mallopt(_M_TRIM_THRESHOLD, _GB)
    except Exception:
        pass  # non-glibc platform: env vars alone still cover children
