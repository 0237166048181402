"""Tracing / metrics — the observability layer the reference lacks.

The reference's only instrumentation is triSYCL's TRISYCL_TRACE_KERNEL
Boost.Log flags and `time ./sycl-rt` (FindTriSYCL.cmake:169-171,
README.md:94-97).  Here: structured per-phase wall timers (device-synced),
Mray/s counters, and an optional jax.profiler TensorBoard trace.
"""
from __future__ import annotations

import contextlib
import json
import logging
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax

log = logging.getLogger("path_tracer_tpu")
if not log.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter(
        "%(asctime)s %(name)s %(levelname)s %(message)s"))
    log.addHandler(_h)
    log.setLevel(logging.INFO)


@dataclass
class PhaseTimer:
    """Accumulates device-synced wall time and ray counts per phase."""
    phases: Dict[str, float] = field(default_factory=dict)
    counts: Dict[str, int] = field(default_factory=dict)
    rays: float = 0.0        # traced path segments
    samples: float = 0.0     # camera rays

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        """Time a phase; pass a jax array as ``sync`` to block on it."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.phases[name] = self.phases.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def add_rays(self, segments: float, samples: float) -> None:
        self.rays += float(segments)
        self.samples += float(samples)

    def summary(self) -> dict:
        render_s = self.phases.get("render", sum(self.phases.values()))
        out = {
            "phases_s": {k: round(v, 4) for k, v in self.phases.items()},
            "calls": dict(self.counts),
        }
        if self.rays and render_s:
            out["mray_per_s"] = round(self.rays / render_s / 1e6, 3)
            out["camera_mray_per_s"] = round(
                self.samples / render_s / 1e6, 3)
            out["avg_path_len"] = round(self.rays / max(self.samples, 1), 3)
        return out

    def log_summary(self) -> None:
        log.info("render metrics %s", json.dumps(self.summary()))


@contextlib.contextmanager
def trace(profile_dir: Optional[str]):
    """jax.profiler TensorBoard trace around a block (no-op if dir empty)."""
    if not profile_dir:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", profile_dir)


def device_memory_stats() -> List[dict]:
    """Per-device HBM stats where the backend exposes them."""
    out = []
    for d in jax.devices():
        try:
            s = d.memory_stats()
        except Exception:
            s = None
        if s:
            out.append({
                "device": str(d),
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            })
    return out
