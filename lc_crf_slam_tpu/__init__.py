"""lc_crf_slam_tpu — TPU-native dynamic RGB-D SLAM.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Zhengjun-Du/LC-CRF-SLAM (an ORB-SLAM2-derived RGB-D SLAM for dynamic scenes
that labels map points static/dynamic with CRF mean-field inference over
long-term track consistency; see SURVEY.md).

Layout:
  geometry/  SE3/Sim3 Lie ops, pinhole camera, Umeyama/Horn alignment
  ops/       compute kernels (JAX/Pallas): pyramid, FAST, ORB, Hamming
             matching, LK flow, Schur-complement BA blocks, CRF messages
  models/    pipeline stages: frame front-end, map state, tracking,
             mapping, CRF labeler, loop closing, system facade
  parallel/  device mesh, shardings, distributed BA / CRF
  utils/     config, TUM IO, ATE/RPE evaluation, synthetic sequences,
             logging, checkpointing
"""

__version__ = "0.1.0"


def enable_compilation_cache(path: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache.

    Cold compile of the chunked tracking scan costs minutes on a remote
    TPU backend; the persistent cache makes every run after the first
    start in seconds. Called by run_slam, bench.py and the driver entry —
    safe to call repeatedly."""
    import hashlib
    import os
    import platform

    import jax

    # TPU/accelerator backends only: with the cache enabled XLA:CPU
    # takes its AOT compile-and-serialize path, which segfaults on the
    # large fused-chunk programs (observed twice in full-suite runs,
    # crash inside backend_compile_and_load; plain JIT compiles the
    # same programs fine). CPU compiles are seconds, the cache's whole
    # value is the minutes-long remote-TPU compile — so gate on backend.
    if jax.default_backend() == "cpu":
        return

    base = path or os.environ.get(
        "SLAM_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    # Scope the cache by a host-CPU fingerprint: XLA:CPU AOT executables
    # embed the compiling machine's feature set (avx512 etc.) and jax's
    # cache key does NOT include it — loading an entry written by a
    # different host SIGILL/segfaults (observed: cpu_aot_loader feature
    # mismatch, then a crash in test runs sharing the cache dir).
    try:
        with open("/proc/cpuinfo") as fh:
            flags = next(
                (ln for ln in fh if ln.startswith("flags")), "")
    except OSError:
        flags = platform.processor()
    fp = hashlib.sha1(
        (platform.machine() + flags).encode()).hexdigest()[:12]
    cache_dir = os.path.join(base, fp)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
