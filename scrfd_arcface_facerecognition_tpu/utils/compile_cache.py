"""Persistent XLA compilation cache setup (shared by bench.py and
__graft_entry__.entry): first compile of the fused pipeline through the
remote compiler costs minutes; subsequent processes hit the on-disk cache
(~130 s -> ~54 s for the driver's entry() compile-check)."""
from __future__ import annotations

import os


def enable_compile_cache(repo_root: str = None) -> None:
    """Idempotent; a cache is an optimization, never a requirement.
    repo_root defaults to the repository containing this package."""
    import jax

    if repo_root is None:
        repo_root = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.join(repo_root, ".jax_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
