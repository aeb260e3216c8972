"""Global configuration for eigd_tpu.

The derivative-parity target (<= 1e-8 relative error against finite-difference
checks, BASELINE.md) requires float64 end to end, so importing eigd_tpu enables
JAX x64 mode. On TPU, f64 matmul/cholesky/eigh are supported (emulated at
reduced throughput); f64 LU is NOT supported by XLA:TPU, which is why every
factorization in eigd_tpu.ops.factor is Cholesky- or eigh-based.
"""

import os

import jax

jax.config.update("jax_enable_x64", True)
# TPU f32 matmuls default to bf16 passes (eps ~ 8e-3): that silently
# destroys the SPD Schur complements of the f32 factorization path (NaN
# Cholesky at scale). Force true-f32 (6-pass) matmul precision everywhere;
# f64 is unaffected.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: first compiles of the jitted solver cores are
# expensive (especially for the f64 CPU test configuration); cache them across
# processes. Disable with EIGD_TPU_NO_COMPILE_CACHE=1.
if not os.environ.get("EIGD_TPU_NO_COMPILE_CACHE"):
    # Key the cache by the host CPU identity: XLA:CPU stores AOT machine
    # code, and an entry compiled on a host with different ISA features is
    # loaded with a "could lead to execution errors such as SIGILL" error —
    # observed here as silently wrong numerics, not just crashes.
    def _host_tag():
        import hashlib
        import platform

        tag = platform.machine()
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith("flags"):
                        tag += hashlib.sha1(
                            line.encode()).hexdigest()[:8]
                        break
        except OSError:  # pragma: no cover - non-Linux
            pass
        # Partition cpu-pinned processes into their own cache: XLA:CPU AOT
        # entries compiled inside a TPU-attached (axon) process embed
        # tuning pseudo-features (+prefer-no-scatter/+prefer-no-gather)
        # that a cpu-pinned process on the SAME host refuses to load
        # ("could lead to execution errors such as SIGILL") — observed as
        # silently wrong numerics, not crashes. TPU-attached processes
        # keep the unsuffixed dir (it holds the expensive TPU compiles).
        plats = (os.environ.get("JAX_PLATFORMS")
                 or os.environ.get("JAX_PLATFORM_NAME") or "")
        if plats and "axon" not in plats and "tpu" not in plats:
            tag += "_" + plats
        return tag

    _cache_dir = os.environ.get(
        "EIGD_TPU_COMPILE_CACHE",
        os.path.expanduser(f"~/.cache/eigd_tpu_xla_{_host_tag()}"),
    )
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        # Threshold 0: the test suite's compile cost is hundreds of SMALL
        # XLA:CPU compiles (~50 ms each, measured via cProfile — 355 in one
        # multigrid test alone); a 0.5 s floor caches none of them. Lookup
        # overhead is ~1 ms/entry, so caching everything is a strict win on
        # this 1-core host.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
