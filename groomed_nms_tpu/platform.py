"""Hermetic JAX platform pinning for script entry points.

The ambient environment may pin ``JAX_PLATFORMS`` to a TPU-tunnel plugin
that force-registers at interpreter start (via a sitecustomize on
``PYTHONPATH``) and **overrides** ``JAX_PLATFORMS=cpu`` set by a caller.
Subprocess tests that export ``JAX_PLATFORMS=cpu`` would otherwise silently
run every compile through the remote TPU tunnel (minutes per graph).

``ensure_requested_platform()`` makes the env var authoritative again: if
the caller asked for ``cpu``, re-pin jax.config after import and clear any
backend that was already initialized.  Scripts call this once at the top of
``main()``; it is a no-op when no explicit platform was requested (normal
TPU runs are untouched).

Counterpart of the reference's implicit device selection
(scripts/train_rpn_3d.py:60 ``torch.cuda.set_device``); here the design is
platform-agnostic: the same entry points drive TPU, virtual-CPU-mesh tests,
and multi-chip dry runs.
"""

import logging
import os


def ensure_requested_platform():
    """Make ``JAX_PLATFORMS=cpu`` authoritative despite plugin overrides.

    Safe to call before or after ``import jax`` as long as no devices have
    been used for computation yet (``clear_backends`` drops any backend that
    was merely initialized).  Returns the effective platform string or None
    when nothing was requested.
    """
    requested = os.environ.get("JAX_PLATFORMS", "")
    if "cpu" not in requested.split(","):
        return None
    import jax
    from jax.extend.backend import clear_backends

    clear_backends()
    jax.config.update("jax_platforms", "cpu")
    clear_backends()
    backend = jax.default_backend()
    logging.getLogger(__name__).info("jax platform pinned: backend=%s "
                                     "devices=%d", backend,
                                     len(jax.devices()))
    assert backend == "cpu", f"requested cpu, got {backend}"
    return backend


def enable_compilation_cache(cache_dir=None):
    """Persistent on-disk XLA compilation cache.

    First eval of a run compiles one program per distinct image size --
    minutes each through a remote-compile tunnel.  The persistent cache
    (keyed on HLO hash) makes every later process reuse them.  Directory
    from ``GROOMED_NMS_TPU_CACHE`` or ``~/.cache/groomed_nms_tpu/xla``;
    disable by setting the env var to ``0``.
    """
    env = os.environ.get("GROOMED_NMS_TPU_CACHE")
    if env == "0":
        return None
    cache_dir = cache_dir or env or os.path.expanduser(
        "~/.cache/groomed_nms_tpu/xla")
    import jax
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # cache is an optimisation, never a hard dep
        logging.getLogger(__name__).warning("compilation cache disabled: %s",
                                            e)
        return None
    return cache_dir


# public TPU v5e peak: 197 TFLOP/s bf16 (one chip).  Used by the benchmark
# plausibility guard below and analysis/roofline_train.py.
V5E_BF16_PEAK_TFLOPS = 197.0


def readout(tree):
    """Forced host readout -- the only reliable timing barrier here.

    On the remote-dispatch runtime (the axon TPU tunnel)
    ``jax.block_until_ready`` returns BEFORE remote execution completes:
    the round-4 audit timed a "blocked" full-resolution batch-8 forward at
    0.5 ms and the recorded benchmark implied ~930 TFLOP/s on a 197 TFLOP/s
    chip.  A host readout cannot lie: the bytes only exist once the program
    ran, and device execution is in-order, so fetching the LAST output of a
    dispatch window proves every earlier call in the window finished too.

    Returns the fetched tree (numpy arrays), so callers can fold the
    readout into their result handling.
    """
    import jax

    return jax.device_get(tree)


def check_physical_rate(flops_per_call, calls, seconds, *, label="bench",
                        peak_tflops=None):
    """Fail loudly when a timing implies more FLOP/s than the chip can do.

    ``flops_per_call`` comes from the compiled program's XLA cost analysis
    (logical FLOPs).  If the measured window implies a FLOP rate above the
    hardware peak, the measurement is broken (e.g. a no-op completion
    barrier timing dispatch instead of compute) -- raise instead of
    recording fantasy numbers.  Returns the implied TFLOP/s.
    """
    import jax

    if peak_tflops is None:
        if jax.default_backend() != "tpu":
            return None  # CPU runs are far from any peak; nothing to check
        peak_tflops = V5E_BF16_PEAK_TFLOPS
    implied = flops_per_call * calls / max(seconds, 1e-12) / 1e12
    if implied > peak_tflops:
        raise SystemExit(
            f"{label}: implied {implied:.1f} TFLOP/s exceeds the "
            f"{peak_tflops:.0f} TFLOP/s chip peak -- the timing window did "
            f"not await device execution (broken completion barrier?). "
            f"Refusing to record a physically impossible number.")
    return implied


def cost_flops(compiled):
    """Logical FLOPs per call of a compiled (lowered) jax program."""
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0)) if ca else 0.0


def force_cpu_mesh(n_devices: int):
    """Hermetically pin jax to an ``n_devices``-wide virtual CPU mesh.

    Used by the driver's multi-chip dry run and by tools that need a
    deterministic device count regardless of ambient platform plugins.
    Never query ``jax.devices()`` before calling this -- that would
    dispatch to the ambient platform.
    """
    import re

    os.environ["JAX_PLATFORMS"] = "cpu"
    flag = f"--xla_force_host_platform_device_count={n_devices}"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" in flags:
        # REPLACE a stale count (from the ambient env or a previous call);
        # merely keeping it would silently cap the mesh below n_devices
        flags = re.sub(r"--xla_force_host_platform_device_count=\d+",
                       flag, flags)
    else:
        flags = (flags + " " + flag).strip()
    os.environ["XLA_FLAGS"] = flags

    import jax
    from jax.extend.backend import clear_backends

    # drop any live backend FIRST: both the XLA flag and jax_num_cpu_devices
    # are read at client creation, and jax.config.update raises once a
    # backend exists
    clear_backends()
    try:
        jax.config.update("jax_num_cpu_devices", n_devices)
    except Exception:
        pass  # older jax: the XLA_FLAGS path above covers it
    ensure_requested_platform()
    devices = jax.devices("cpu")
    assert len(devices) >= n_devices, (
        f"need {n_devices} CPU devices, have {len(devices)}")
    return devices[:n_devices]
