"""Checkpointed rendering — preemption-safe sample accumulation.

The reference renders the whole frame in one kernel and writes the image
once at exit (render.hpp:151, main.cpp:194); a killed job loses everything.
Here the frame is an accumulator over sample ranges: after every
``checkpoint_every`` samples the per-pixel radiance SUM (not mean) plus
metadata lands on disk, and a restarted job resumes at the first sample
index not yet accumulated.  Because every (pixel, sample) lane has its own
counter-derived RNG stream (core/rng.seed_perf), the resumed result is
bit-identical to an uninterrupted run with the same config.
"""
from __future__ import annotations

import json
import os
import tempfile
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.vec import Vec3
from ..scene import types as T
from ..utils.profiling import log
from .integrator import _render_chunk_jit


def _ckpt_paths(ckpt_dir: str) -> Tuple[str, str]:
    return (os.path.join(ckpt_dir, "accum.npz"),
            os.path.join(ckpt_dir, "meta.json"))


def _save_atomic(ckpt_dir: str, acc: np.ndarray, meta: dict) -> None:
    """Write accum + meta via rename so a crash mid-save can't corrupt."""
    os.makedirs(ckpt_dir, exist_ok=True)
    acc_path, meta_path = _ckpt_paths(ckpt_dir)
    fd, tmp = tempfile.mkstemp(dir=ckpt_dir, suffix=".npz.tmp")
    with os.fdopen(fd, "wb") as f:
        np.savez(f, acc=acc)
    os.replace(tmp, acc_path)
    fd, tmp = tempfile.mkstemp(dir=ckpt_dir, suffix=".json.tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, meta_path)


def load_checkpoint(ckpt_dir: str, expect_meta: dict
                    ) -> Tuple[Optional[np.ndarray], int]:
    """Returns (accumulator (N,3) or None, samples already done).  A
    checkpoint whose identity keys mismatch the requested render is ignored
    (and reported) rather than silently blended in."""
    acc_path, meta_path = _ckpt_paths(ckpt_dir)
    if not (os.path.exists(acc_path) and os.path.exists(meta_path)):
        return None, 0
    try:
        with open(meta_path) as f:
            meta = json.load(f)
        keys = ("scene", "width", "height", "max_depth", "seed", "t_min",
                "attenuate_emission", "renderer")
        if any(meta.get(k) != expect_meta[k] for k in keys):
            log.warning("checkpoint at %s is for a different render "
                        "(%s) — ignoring", ckpt_dir,
                        {k: meta.get(k) for k in keys})
            return None, 0
        acc = np.load(acc_path)["acc"]
        return acc, int(meta["spp_done"])
    except Exception as e:  # corrupt checkpoint -> start over
        log.warning("failed to load checkpoint at %s: %s", ckpt_dir, e)
        return None, 0


def render_checkpointed(scene: T.Scene, cam, width: int, height: int,
                        spp: int, max_depth: int = 50,
                        attenuate_emission: bool = False,
                        t_min: float = 1e-3, seed: int = 0,
                        ckpt_dir: str = "", checkpoint_every: int = 50,
                        scene_name: str = "", max_lanes: int = 1 << 17,
                        renderer: str = "wq") -> jnp.ndarray:
    """Sample-range render with periodic on-disk accumulation.

    renderer="wq" (default) drives the PRODUCTION windowed work-queue
    megakernel one dispatch per spp-range (engine.wq.render_wq_range);
    "jnp" keeps the wavefront integrator chunk loop.  Output (H, W, 3)
    radiance means; per-(pixel, sample) streams make a resumed run
    bit-identical to an uninterrupted one with the same range boundaries."""
    n = width * height
    meta_id = {"scene": scene_name, "width": width, "height": height,
               "max_depth": max_depth, "seed": seed, "t_min": t_min,
               "attenuate_emission": attenuate_emission,
               "renderer": renderer}

    acc_np, spp_done = (None, 0)
    if ckpt_dir:
        acc_np, spp_done = load_checkpoint(ckpt_dir, meta_id)
        if spp_done:
            log.info("resuming from checkpoint: %d/%d spp done",
                     spp_done, spp)
    acc = (jnp.asarray(acc_np) if acc_np is not None
           else jnp.zeros((n, 3), jnp.float32))

    if renderer == "wq":
        # one megakernel dispatch per checkpoint range
        spp_chunk = max(1, min(spp, checkpoint_every))
    else:
        spp_chunk = max(1, min(spp, max_lanes // min(n, max_lanes)))
        tile_pix = max(1, min(n, max_lanes // spp_chunk))
    seed_arr = jnp.uint32(seed)
    since_ckpt = 0

    s0 = spp_done
    while s0 < spp:
        sc = min(spp_chunk, spp - s0)
        if renderer == "wq":
            from .wq import render_wq_range
            acc = acc + render_wq_range(
                scene, cam, width, height, s0, sc, max_depth=max_depth,
                attenuate_emission=attenuate_emission, t_min=t_min,
                seed=seed)
        else:
            parts = []
            for p0 in range(0, n, tile_pix):
                npx = min(tile_pix, n - p0)
                part = _render_chunk_jit(
                    scene, cam, width, height, sc, max_depth,
                    attenuate_emission, t_min, False,
                    jnp.uint32(p0), npx, jnp.uint32(s0), seed_arr)
                parts.append(jnp.stack([part.x, part.y, part.z], axis=-1))
            acc = acc + jnp.concatenate(parts, axis=0)
        s0 += sc
        since_ckpt += sc
        if ckpt_dir and (since_ckpt >= checkpoint_every or s0 >= spp):
            acc_host = np.asarray(jax.block_until_ready(acc))
            _save_atomic(ckpt_dir, acc_host, {**meta_id, "spp_done": s0})
            log.info("checkpoint: %d/%d spp -> %s", s0, spp, ckpt_dir)
            since_ckpt = 0

    mean = acc / jnp.float32(spp)
    return mean.reshape(height, width, 3)
