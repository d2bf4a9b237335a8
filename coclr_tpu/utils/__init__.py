import os as _os


def enable_compilation_cache(path: str = ""):
    """Persistent XLA compilation cache (first S3D step compile is ~10 min
    on the axon remote compiler; cached reruns are seconds)."""
    import jax

    if not path:
        path = _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.dirname(_os.path.abspath(__file__)))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
