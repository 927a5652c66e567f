"""Host-fingerprinted persistent-compile-cache locations.

XLA:CPU persists AOT executables keyed on HLO + jaxlib version but NOT on
the host CPU's target features.  This project's sessions migrate between
hosts (and a remote-compile helper runs yet another jaxlib), so a shared
cache dir accumulates entries compiled for a different machine; loading one
at best logs a target-feature mismatch and recompiles, at worst SIGILLs
(observed: crash inside ``compilation_cache.get_executable_and_time`` at 97%
of the test suite).  Scoping the CPU cache dir by a fingerprint of the
host's CPU flags + jaxlib version makes cross-host entries invisible
instead of trusting the loader to reject them.
"""

from __future__ import annotations

import hashlib
import os
import platform


def _host_fingerprint() -> str:
    """Short stable digest of the bits that key XLA:CPU AOT compatibility."""
    parts = [platform.machine()]
    try:
        import jaxlib

        parts.append(getattr(jaxlib, "__version__", "?"))
    except Exception:
        parts.append("?")
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    # flags are identical across cores; one line suffices
                    parts.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
    except OSError:
        parts.append(platform.processor())
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:10]


def cpu_cache_dir() -> str:
    """Per-host CPU compile-cache dir (created by JAX on first write)."""
    return os.path.expanduser(f"~/.cache/puflow_tpu_jax_cpu_{_host_fingerprint()}")
