"""Host allocator tuning for the CPU side of the data pipeline.

The batch-sampling hot loop churns large short-lived numpy buffers. glibc by
default mmap()s big allocations and returns them to the OS on free, so every
batch pays fresh page faults — catastrophic on demand-paged VMs (lazily
restored Firecracker snapshots fetch pages from the host on first touch,
~1000x slower than a warm page) and still measurable on bare metal.

``configure_host_allocator`` raises M_MMAP_THRESHOLD and disables trimming so
large buffers live on the (already warm) heap and are reused. Called once at
package import; safe no-op on non-glibc platforms.
"""

from __future__ import annotations

import ctypes

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3

_done = False


def configure_host_allocator() -> None:
    """Keep large allocations on the reusable heap (glibc mallopt)."""
    global _done
    if _done:
        return
    _done = True
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(_M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(_M_TRIM_THRESHOLD, 1 << 30)
    except Exception:  # pragma: no cover - non-glibc platforms
        pass
