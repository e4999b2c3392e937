"""Persistent XLA compilation cache for the CLIs.

The flagship 65M NCSN++ enhance/train programs cost ~60 s to compile on a
remote-compile TPU backend (docs/PERFORMANCE.md, round 2). JAX's persistent
compilation cache writes the compiled executable to disk keyed on the HLO
hash, so every warm CLI start (same model config + same padded shape bucket)
skips the compile entirely — measured on this backend: 0.87 s -> 0.17 s on a
toy program, and the full 65M enhance program loads from cache in ~2 s
instead of recompiling.

The reference has no analogue (PyTorch eager has no compile step to cache);
this is a TPU-native quality-of-life extension, enabled by default in the
CLIs and opt-out via ``SGMSE_TPU_COMPILE_CACHE=0``.
"""
import os


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Enable JAX's on-disk compilation cache. Call before the first jit.

    Resolution order for the cache directory:
    1. explicit ``cache_dir`` argument,
    2. ``SGMSE_TPU_COMPILE_CACHE`` env var (``0``/``off``/empty disables),
    3. ``~/.cache/sgmse_tpu/xla``.

    Returns the directory in use, or None if disabled or unavailable.
    """
    env = os.environ.get("SGMSE_TPU_COMPILE_CACHE")
    if cache_dir is None:
        if env is not None:
            if env.strip().lower() in ("", "0", "off", "none", "false"):
                return None
            cache_dir = env
        else:
            cache_dir = os.path.join(os.path.expanduser("~"), ".cache",
                                     "sgmse_tpu", "xla")
    try:
        import jax
        if jax.process_count() > 1:
            # Per-process subdir in multi-process runtimes: with a SHARED
            # cache dir, a process that hits the cache reaches the first
            # collective a whole compile-time ahead of a process that
            # misses, which can exceed the collective-context connect
            # timeout (observed: Gloo context init 30 s deadline on the
            # 2-process CPU test). Per-process dirs keep compile work
            # symmetric: all processes miss together or hit together.
            cache_dir = os.path.join(cache_dir, f"proc{jax.process_index()}")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache every compile that takes >=1 s: the hot programs here cost
        # tens of seconds; 1 s keeps toy/test programs from churning the dir.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return cache_dir
    except Exception:  # pragma: no cover - cache is best-effort
        return None
