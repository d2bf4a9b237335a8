import os as _os


def pin_malloc_mmap_threshold(threshold: int = 1 << 20) -> bool:
    """Pin glibc's M_MMAP_THRESHOLD (disables its dynamic adaptation).

    Root cause of the round-5 fullcard-drive OOM (129 GB anon RSS after
    1,293 steps, ~= ONE host u8 batch per step): when a >=128 KB mmap'd
    block is freed, glibc RAISES the mmap threshold to that size (capped
    at 32 MB), so the next same-size allocation is carved from the
    sbrk/arena heap instead. A video train loop frees multi-MB blocks
    constantly (per-sample decode buffers in loader worker threads,
    collate stacks, the runtime's host copies), so the threshold adapts
    upward within seconds and every later batch-sized allocation lands in
    a thread arena, interleaved with long-lived small allocations — the
    freed space fragments and is never returned to the OS. Growth is
    ~batch_bytes/step with no plateau; it is invisible to gc (no Python
    object leaks) and to jax.live_arrays() (no device buffer leaks), and
    jax.Array.delete() does not help (the pages are free, just not
    released). Pinned-threshold A/B: heap segment EXACTLY flat over 12
    production-shape steps vs +4-9 MB/step unpinned (DESIGN.md "Round 5:
    the 129 GB drive OOM").

    1 MiB keeps small-object churn in the (fast) arenas while every
    batch-scale block goes back to mmap/munmap. Called at every training
    /eval entry point; safe no-op on non-glibc."""
    try:
        import ctypes

        libc = ctypes.CDLL(None, use_errno=True)
        if not hasattr(libc, "mallopt"):
            return False
        return bool(libc.mallopt(-3, int(threshold)))  # M_MMAP_THRESHOLD
    except Exception:
        return False


def malloc_trim() -> bool:
    """Release free heap memory back to the OS (glibc malloc_trim(0)).

    Belt-and-braces companion to pin_malloc_mmap_threshold: epoch-boundary
    calls cap any residual arena growth from sub-threshold churn."""
    try:
        import ctypes

        libc = ctypes.CDLL(None, use_errno=True)
        if not hasattr(libc, "malloc_trim"):
            return False
        return bool(libc.malloc_trim(0))
    except Exception:
        return False


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
