"""path_tracer_tpu — a TPU-native differentiable Monte-Carlo path tracer.

A from-scratch JAX/XLA/Pallas framework with the full feature set of the
triSYCL/path_tracer reference (see SURVEY.md): sphere/triangle/rect/box
geometry, Lambertian/metal/dielectric/emissive/isotropic-smoke materials,
solid/checker/image textures, a thin-lens camera with depth of field and
motion blur — redesigned for TPUs as branchless SoA wavefront kernels with
counter-seeded RNG, multi-chip sharding, and end-to-end differentiability.
"""

from .core.camera import Camera
from .core.vec import Vec3
from .scene.builder import SceneBuilder
from .engine.integrator import render_parity, render_perf, trace

__version__ = "0.1.0"

__all__ = [
    "Camera",
    "Vec3",
    "SceneBuilder",
    "render_parity",
    "render_perf",
    "trace",
]
