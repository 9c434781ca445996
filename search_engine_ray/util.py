"""Small runtime helpers."""

from __future__ import annotations


def default_pool_max(cap: int = 64) -> int:
    """Upper bound for elastic (1, k) actor pools: the cluster CPU count
    (pools stay elastic, so oversizing only sets a ceiling — the streaming
    executor still shares cores with task operators)."""
    try:
        import ray
        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 8))
            return max(1, min(cap, cpus))
    except Exception:
        pass
    return 8
