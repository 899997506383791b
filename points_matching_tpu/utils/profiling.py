"""Tracing / profiling / roofline accounting (SURVEY.md §5: the reference's
only observability is console prints; here: ``jax.profiler`` traces,
``named_scope`` stage markers, and per-function roofline reports against
the BASELINE ≥70%-of-roofline target).
"""
from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Any, Callable, Dict, Optional

import jax


# Peak per-chip numbers (dense f32-accumulated MXU matmul path and HBM BW).
# Sources: public TPU spec sheets; keyed by lowercased device-kind substring.
_CHIP_PEAKS = {
    # v5e ("v5 lite"): 197 TFLOP/s bf16 peak, 819 GB/s HBM
    "v5 lite": dict(flops=197e12, hbm_gbps=819.0),
    "v5e": dict(flops=197e12, hbm_gbps=819.0),
    "v4": dict(flops=137.5e12, hbm_gbps=1228.0),
    "v5p": dict(flops=229e12, hbm_gbps=2765.0),
    "v6": dict(flops=918e12, hbm_gbps=1640.0),
    "cpu": dict(flops=1e12, hbm_gbps=100.0),
}

# Minimum resolvable single-call gap in fetch-sync mode (the fetch latency
# jitter measured on the tunneled backend is ~±40 ms; see bench.py).
_FETCH_NOISE_FLOOR_S = 0.1


def chip_peaks() -> Dict[str, float]:
    dev = jax.devices()[0]
    kind = dev.device_kind.lower()
    for key, peaks in _CHIP_PEAKS.items():
        if key in kind:
            return peaks
    # Unknown TPU chip (e.g. an experimental platform like 'axon' whose
    # device_kind string doesn't name a known generation): falling back to
    # the 1-TFLOP CPU peak would make every roofline fraction nonsense, so
    # assume the most common current chip (v5e) instead.
    if dev.platform in ("tpu", "axon"):
        return _CHIP_PEAKS["v5e"]
    return _CHIP_PEAKS["cpu"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def stage(name: str):
    """Named scope for pipeline stages (shows up in traces)."""
    return jax.named_scope(name)


@dataclasses.dataclass
class RooflineReport:
    wall_s: float
    flops: Optional[float]
    bytes_accessed: Optional[float]
    achieved_tflops: Optional[float]
    peak_tflops: float
    fraction_of_roofline: Optional[float]
    bandwidth_gbps: Optional[float]
    arithmetic_intensity: Optional[float]
    # False when the measured wall time is below the sync noise floor
    # (fetch-mode only): the rate fields are then None rather than garbage.
    reliable: bool = True

    def __str__(self):
        f = lambda v, fmt: (fmt % v) if v is not None else "n/a"
        return (
            f"wall {self.wall_s*1e3:.3f} ms | "
            f"{f(self.achieved_tflops, '%.2f')} TFLOP/s "
            f"({f(self.fraction_of_roofline and self.fraction_of_roofline * 100, '%.1f')}% of "
            f"{self.peak_tflops:.0f} peak) | "
            f"{f(self.bandwidth_gbps, '%.1f')} GB/s | "
            f"AI {f(self.arithmetic_intensity, '%.1f')} flop/byte"
        )


def _fetch_sync(out) -> float:
    """True device barrier: fetch ONE scalar that data-depends on ``out``.

    On the tunneled 'axon' backend ``block_until_ready``/``is_ready`` are
    no-ops (they return before the device has executed anything), so the
    only reliable synchronization is a device→host fetch of a dependent
    value.  One combined scalar keeps it to a single round-trip.
    """
    import jax.numpy as jnp

    leaves = [
        l for l in jax.tree.leaves(out)
        if hasattr(l, "ravel") and getattr(l, "size", 0) > 0
    ]
    if not leaves:
        return 0.0
    s = jnp.stack([l.ravel()[0].astype(jnp.float32) for l in leaves]).sum()
    return float(s)


def roofline(
    fn: Callable, *args, iters: int = 20, sync: str = "auto", **kwargs
) -> RooflineReport:
    """Measure a jitted function against the chip roofline.

    Uses XLA's compiled cost analysis for flop/byte counts and wall-clock
    for the rate.  Verifies the BASELINE '≥70% of roofline' claim per op.

    ``sync``: 'loop' times ``iters`` back-to-back calls ended by
    ``block_until_ready`` (correct on backends with working ready-events:
    cpu, real tpu).  'fetch' times ONE dispatch + a dependent scalar fetch,
    minus a measured fetch intercept — required on the tunneled 'axon'
    backend where block_until_ready is a no-op (see bench.py module
    docstring); single-call resolution is the fetch-latency noise (~±40 ms
    there), so sub-millisecond ops need an externally scanned workload.
    'auto' picks 'fetch' on 'axon', 'loop' elsewhere.
    """
    jitted = jax.jit(fn) if not hasattr(fn, "lower") else fn
    out = jitted(*args, **kwargs)  # compile through the normal jit path
    if sync == "auto":
        sync = "fetch" if jax.devices()[0].platform == "axon" else "loop"
    reliable = True

    if sync == "loop":
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jitted(*args, **kwargs)
        jax.block_until_ready(out)
        wall = (time.perf_counter() - t0) / iters
    else:
        _fetch_sync(out)  # warm the fetch path
        reps = 3

        def _min_time(thunk):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                thunk()
                best = min(best, time.perf_counter() - t0)
            return best

        intercept = _min_time(lambda: _fetch_sync(out))
        total = _min_time(
            lambda: _fetch_sync(jitted(*args, **kwargs))
        )
        wall = max(total - intercept, 1e-9)
        # Fetch latency jitters by ~±40 ms on the tunneled backend; a
        # single-call difference below that floor is indistinguishable
        # from noise, so refuse to report a rate (ADVICE r2: clamping to
        # 1e-9 turned sub-ms ops into absurd >100% roofline fractions).
        if total - intercept < _FETCH_NOISE_FLOOR_S:
            reliable = False

    # Cost analysis strictly AFTER the jit warmup: on 'axon', an AOT
    # lower().compile() issued before the first jit execution poisons the
    # jit cache with a ~10⁵× slower executable; issued after, it is a
    # cache hit on the fast one (same pitfall documented in bench.py).
    compiled = jitted.lower(*args, **kwargs).compile()
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0)) or None
        bts = float(ca.get("bytes accessed", 0.0)) or None
    except Exception:
        flops, bts = None, None

    peaks = chip_peaks()
    achieved = flops / wall / 1e12 if (flops and reliable) else None
    return RooflineReport(
        wall_s=wall,
        flops=flops,
        bytes_accessed=bts,
        achieved_tflops=achieved,
        peak_tflops=peaks["flops"] / 1e12,
        fraction_of_roofline=(achieved / (peaks["flops"] / 1e12)) if achieved else None,
        bandwidth_gbps=(bts / wall / 1e9) if (bts and reliable) else None,
        arithmetic_intensity=(flops / bts) if (flops and bts) else None,
        reliable=reliable,
    )
