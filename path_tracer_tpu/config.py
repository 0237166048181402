"""Runtime render configuration.

The reference's configuration is entirely compile-time (CMake options ->
preprocessor defines -> constexpr, build_parameters.hpp:3-19; samples/depth
hard-coded at main.cpp:186 / render.hpp:144).  Here the same knobs are a
runtime dataclass: static ints are handed to jit as Python ints, so each
distinct config compiles once and is cached — the XLA analogue of the
reference's per-config binary.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

# Single source of truth for launch strategies: the CLI's --renderer
# choices, RenderConfig.validate, and the auto default all key off this.
RENDERERS = ("auto", "wq", "wavefront", "fused", "perf",
             "parity")


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Every knob the reference exposes (and the ones it hard-codes).

    width/height — CMake OUTPUT_WIDTH/HEIGHT (CMakeLists.txt:44-54,
    default 800x480); spp — main.cpp:186 (100); max_depth —
    render.hpp:144 (50); renderer selects the launch strategy the way
    USE_SINGLE_TASK does (render.hpp:113-137), except every strategy here
    is device-wide data-parallel.
    """
    scene: str = "final_scene"
    width: int = 800
    height: int = 480
    spp: int = 100
    max_depth: int = 50
    # auto resolves to the production megakernel on accelerators (see
    # cli.resolve_renderer) and the jnp bounce loop on CPU.  Every choice
    # the CLI offers must be accepted by validate() below.
    renderer: str = "auto"
    seed: int = 0
    t_min: float = 1e-3
    # False replicates the reference's emission quirk (render.hpp:73):
    # scatter-miss returns emitted WITHOUT the path throughput factor.
    attenuate_emission: bool = False
    out: str = "out.png"
    ppm: bool = False                # also dump PPM (main.cpp:17-31 analogue)
    # wavefront tuning
    tile_pix: int = 16384
    slots: int = 4
    # checkpointing: save partial accumulators every N spp; "" disables
    checkpoint_dir: str = ""
    checkpoint_every: int = 0
    profile_dir: str = ""            # jax.profiler trace output

    def validate(self) -> "RenderConfig":
        from .scene.presets import PRESETS
        if self.scene not in PRESETS:
            raise ValueError(
                f"unknown scene {self.scene!r}; have {sorted(PRESETS)}")
        if self.renderer not in RENDERERS:
            raise ValueError(f"unknown renderer {self.renderer!r}; "
                             f"have {RENDERERS}")
        for f in ("width", "height", "spp", "max_depth"):
            if getattr(self, f) <= 0:
                raise ValueError(f"{f} must be positive")
        return self

    @classmethod
    def for_preset(cls, name: str, **overrides) -> "RenderConfig":
        """Config pre-filled with a preset's staged benchmark geometry."""
        from .scene.presets import PRESETS
        p = PRESETS[name]
        base = dict(scene=name, width=p.width, height=p.height, spp=p.spp,
                    max_depth=p.max_depth)
        base.update(overrides)
        return cls(**base).validate()
