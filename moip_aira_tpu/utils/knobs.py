"""Registry of kernel-SHAPING env knobs — the single source of truth.

Any ``MOIP_*`` environment variable that changes the *generated device
code* (kernel structure, buffer sizes, pivot rules — anything that makes
two processes with different settings want different executables) MUST be
read through :func:`get` so it is registered here.  The AOT executable
cache (utils/aot_cache.py) folds exactly this registry into its cache key;
a knob read via ``os.environ`` directly would silently load a semantically
different cached kernel (advisor finding, round 4).

Knobs that only change HOST behaviour (schedulers, tracing, budgets that
never reach a kernel) do not belong here.
"""

from __future__ import annotations

import os

#: knob -> canonical "unset" default used for cache-key hashing, so an
#: explicitly-set default (MOIP_FRAG_CAP=2048) and an unset knob key
#: identically
KERNEL_KNOBS = {
    "MOIP_FRAG_P1_STALL": "",
    "MOIP_FRAG_VMEM_MB": "44",
    "MOIP_FRAG_CAP": "2048",
    "MOIP_FRAG_NODE_ITERS": "",
}


def get(name: str, default: str | None = None) -> str:
    """Read a kernel-shaping knob; ``name`` must be registered above.

    ``default`` overrides the registry default for call sites whose
    fallback is computed at runtime (e.g. shape-dependent budgets); the
    registry still records the canonical unset form for hashing.
    """
    if name not in KERNEL_KNOBS:
        raise KeyError(
            f"{name} is not in utils.knobs.KERNEL_KNOBS — register it there "
            "(the AOT cache key depends on it)"
        )
    val = os.environ.get(name)
    if val is not None:
        return val
    return KERNEL_KNOBS[name] if default is None else default
