"""Platform selection helper.

The container's sitecustomize registers the axon TPU plugin and sets
jax_platforms='axon,cpu' at interpreter boot, which outranks the
JAX_PLATFORMS env var. EKAID_PLATFORM=cpu (optionally with
EKAID_HOST_DEVICES=N) forces the CPU backend before any computation —
used by CLIs for data-pipeline smoke runs and multi-device CPU tests.
"""

from __future__ import annotations

import os


def _host_fingerprint() -> str:
    """Hash of the host CPU's identity + feature flags + the jaxlib
    version. XLA:CPU AOT artifacts are keyed by program, NOT by the
    compiling machine's features — loading one on a host missing an ISA
    feature can SIGILL (observed: a cached entry warned
    'prefer-no-gather is not supported on the host machine'). Scoping
    the cache dir per host fingerprint makes a moved/rescheduled
    container recompile instead of risking it. The flags line alone
    proved insufficient on this migrating VM (r4 full-suite runs still
    hit cpu_aot_loader feature warnings), so the fingerprint now also
    covers model name / family / stepping and the jaxlib build."""
    import hashlib
    parts = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in ("flags", "model name", "cpu family", "model",
                           "stepping", "vendor_id"):
                    val = line.split(":", 1)[1].strip()
                    if key == "flags":
                        val = " ".join(sorted(val.split()))
                    parts.append(f"{key}={val}")
                if key == "power management":  # end of first CPU block
                    break
    except OSError:
        pass
    try:
        import jaxlib
        parts.append(f"jaxlib={jaxlib.__version__}")
    except Exception:
        pass
    if not parts:
        import platform as _platform
        return _platform.machine() or "unknown"
    return hashlib.sha256("|".join(sorted(set(parts))).encode()).hexdigest()[:12]


# Default cache root. /tmp does NOT survive the round boundary on this
# host (r4: the driver's round-end bench ran cold — 1,404 s b64 — and
# time-guarded away the measured-best b128 operating point), while the
# repo directory demonstrably persists (its git history does). Keep the
# cache inside the repo, gitignored. EKAID_CACHE_DIR overrides.
_CACHE_ROOT = os.environ.get(
    "EKAID_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jaxcache"),
)


def enable_compile_cache(path: str | None = None) -> str:
    """Persistent XLA compile cache. The axon remote-compile service
    takes minutes on the full decode program; caching makes repeat
    bench/serving launches pay it once per program, not per process.
    The directory is scoped by a host-CPU fingerprint (see
    _host_fingerprint) so CPU AOT artifacts never cross machines.
    Returns the cache directory."""
    import jax

    path = os.path.join(path or _CACHE_ROOT, _host_fingerprint())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    return path


def resolve_roi_backend(backend: str) -> str:
    """Resolve a `detector.roi_backend` of 'auto' to a concrete
    'canvas' (TPU: whole-pyramid-in-VMEM ROIAlign, 3.6× the patch-DMA
    kernel at the extraction geometry) / 'xla' (everything else) ONCE,
    at build time.

    This is the config/runner-layer home for the device query: module
    setup() must never call jax.devices() — on a wedged axon claim that
    hangs indefinitely (memory: axon-tpu-quirks), it would fire at every
    model construction including CPU test inits, and it would bake the
    trace-time platform into the module, breaking cross-platform AOT
    lowering."""
    if backend != "auto":
        return backend
    import jax
    try:
        return ("canvas" if jax.default_backend() == "tpu" else "xla")
    except Exception:
        return "xla"


def resolve_decode_kernel(kernel: str, sharded_ok: bool = False) -> str:
    """Resolve a `speaker.decode_kernel` of 'auto' to 'pallas' on TPU
    (the whole-loop greedy-decode kernel, models/pallas_decode.py:
    hardware-proven token-exact vs XLA at pinned-f32 precision, and
    measured b64 10,689 / b128 13,876 pairs/s vs the XLA path's
    10,0-10,6k / 13,0-13,3k same-day band — r4 decode_pallas A/B) and
    'xla' everywhere else. Same build-time-only device-query rule as
    resolve_roi_backend above. An UNRESOLVED 'auto' is safe: the
    decoder treats anything that isn't 'pallas*' as the XLA path, so
    CPU tests and the multichip dryrun never need the resolver.

    sharded_ok=True: the caller threads a jax.sharding.Mesh into the
    model (EkaidModel(decode_mesh=...)), so the kernel runs under
    shard_map over 'data' on multi-device hosts (VERDICT r4 #4) and
    'auto' may resolve to 'pallas' regardless of device count. Without
    it, a bare pallas_call has no GSPMD partitioning rule and
    multi-device meshes must keep the XLA loop."""
    if kernel != "auto":
        return kernel
    import jax
    try:
        return ("pallas" if jax.default_backend() == "tpu"
                and (sharded_ok or len(jax.devices()) == 1) else "xla")
    except Exception:
        return "xla"


def apply_platform_env() -> None:
    plat = os.environ.get("EKAID_PLATFORM")
    if not plat:
        return
    n = os.environ.get("EKAID_HOST_DEVICES")
    if n:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n}"
            ).strip()
    import jax
    jax.config.update("jax_platforms", plat)
