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
CLIs (single-process only — see the multi-process note in
``enable_persistent_cache``) and opt-out via ``SGMSE_TPU_COMPILE_CACHE=0``.
"""
import os


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Enable JAX's on-disk compilation cache. Call before the first jit.

    Resolution order for the cache directory:
    1. explicit ``cache_dir`` argument,
    2. ``SGMSE_TPU_COMPILE_CACHE`` env var (``0``/``off``/empty disables),
    3. ``~/.cache/sgmse_tpu/xla`` — but only when ``jax.process_count() == 1``;
       multi-process runs get no cache unless 1. or 2. opted in explicitly.

    The on-disk size is LRU-capped (``SGMSE_TPU_COMPILE_CACHE_MAX_GB``,
    default 8 GB). Returns the directory in use, or None if disabled or
    unavailable.
    """
    env = os.environ.get("SGMSE_TPU_COMPILE_CACHE")
    explicit = cache_dir is not None
    if cache_dir is None:
        if env is not None:
            if env.strip().lower() in ("", "0", "off", "none", "false"):
                return None
            cache_dir = env
            explicit = True
        else:
            cache_dir = os.path.join(os.path.expanduser("~"), ".cache",
                                     "sgmse_tpu", "xla")
    try:
        import jax
        if jax.process_count() > 1 and not explicit:
            # DISABLED by default in multi-process runtimes (opt back in by
            # setting SGMSE_TPU_COMPILE_CACHE explicitly). A rank that hits
            # the cache reaches the first collective a whole compile-time
            # ahead of a rank that misses, which blows the CPU-collectives
            # Gloo context-init deadline (fixed 30 s, not configurable from
            # Python). Asymmetric hits are the NORM, not the exception: any
            # rank that crashes mid-run leaves its entries unwritten, and
            # per-process subdirs were observed to wedge the 2-process test
            # permanently this way (proc0 populated, proc1 empty). When ranks
            # compile from scratch they interleave on the CPU and arrive at
            # the collective together; that is the safe default.
            return None
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache every compile that takes >=1 s: the hot programs here cost
        # tens of seconds; 1 s keeps toy/test programs from churning the dir.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        # LRU-evict above a size cap: one full-size 65M sampler executable is
        # ~900 MB on this backend, so an uncapped dir grows by a gigabyte per
        # new shape bucket (observed: 16 GB after one day's drives).
        max_gb = float(os.environ.get("SGMSE_TPU_COMPILE_CACHE_MAX_GB", "8"))
        jax.config.update("jax_compilation_cache_max_size",
                          int(max_gb * 1024 ** 3))
        return cache_dir
    except Exception:  # pragma: no cover - cache is best-effort
        return None
