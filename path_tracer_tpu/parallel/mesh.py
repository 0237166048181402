"""Multi-chip execution: device meshes, sharded rendering, and distributed
differentiable training steps.

The reference is strictly single-process/single-device — its only parallel
axis is the per-pixel work-item grid (render.hpp:124-136, SURVEY.md §2).  The
TPU-native scaling design (SURVEY.md §5.8):

* a ``Mesh`` over (tiles, spp): the pixel axis is data-parallel across chips,
  and samples-per-pixel can additionally split across a second axis;
* the scene is tiny (~hundreds of primitives) and is **replicated**;
* sample partial sums ride ``psum`` over the spp axis (ICI), image assembly
  needs no gather at all when the fb is sharded by tiles;
* for inverse rendering, parameter gradients are ``psum``-reduced across
  every mesh axis — the all-reduce the north star asks for.

Everything here is pure `shard_map` + collectives; it runs identically on a
virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8) and on
real slices.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core import rng as rng_mod
from ..core.camera import Camera
from ..core.vec import Vec3
from ..diff.params import combine, partition
from ..engine.integrator import camera_rays, trace
from ..scene import types as T


def make_mesh(n_tiles: Optional[int] = None, n_spp: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_tiles is None:
        n_tiles = n // n_spp
    assert n_tiles * n_spp <= n, "mesh larger than device count"
    dev_array = np.array(devices[: n_tiles * n_spp]).reshape(n_tiles, n_spp)
    return Mesh(dev_array, ("tiles", "spp"))


# ---------------------------------------------------------------------------
# Sharded forward render
# ---------------------------------------------------------------------------

def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def render_sharded(scene: T.Scene, cam: Camera, width: int, height: int,
                   spp: int, mesh: Mesh, max_depth: int = 50,
                   attenuate_emission: bool = False, t_min: float = 1e-3,
                   seed: int = 0, renderer: str = "wq",
                   interpret: Optional[bool] = None,
                   tile_rows: Optional[int] = None,
                   window: Optional[int] = None) -> jnp.ndarray:
    """Forward render over the mesh: pixels sharded on "tiles", samples on
    "spp" (partial sums psum-reduced over ICI).  Returns the (H, W, 3)
    image ("tiles"-sharded rows; index/np.asarray gathers it).

    renderer="wq" (default) runs the production windowed work-queue
    megakernel per shard (engine.wq.wq_window_fb); "jnp" the XLA wavefront
    integrator.  Ragged shapes are handled by padding: pixel rows pad up to
    the tile axis and trailing sample chunks mask off, so any (W, H, spp)
    works — no divisibility requirement."""
    n_tiles = mesh.shape["tiles"]
    n_spp = mesh.shape["spp"]
    n_pix = width * height

    if renderer == "wq":
        from ..engine.wq import (DEF_TILE_ROWS, DEF_WINDOW, pick_chunk,
                                 wq_window_fb)
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        if tile_rows is None:
            tile_rows = DEF_TILE_ROWS if not interpret else 8
        if window is None:
            window = DEF_WINDOW if not interpret else 3
        # cap the chunk so the spp axis carries >= 1 chunk per shard
        # (C = spp would fold everything into cpp=1 and idle every spp
        # shard past the first)
        C = pick_chunk(spp, cap=min(10, max(1, spp // n_spp)))
        cpp = spp // C
        cpp_loc = _ceil_div(cpp, n_spp)
        spp_loc = cpp_loc * C
        n_pix_loc = _ceil_div(n_pix, n_tiles)

        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(), P()), out_specs=P("tiles"),
            # pallas_call can't annotate varying-mesh-axes metadata on its
            # outputs yet; the body is purely local + one explicit psum.
            check_vma=False,
        )
        def shard_render(scene_, cam_):
            t = jax.lax.axis_index("tiles").astype(jnp.int32)
            k = jax.lax.axis_index("spp").astype(jnp.int32)
            pix_base = t * n_pix_loc
            samp_base = k * spp_loc
            valid_pix = jnp.clip(n_pix - pix_base, 0, n_pix_loc)
            valid_cpp = jnp.clip(cpp - k * cpp_loc, 0, cpp_loc)
            fb, _, _, _ = wq_window_fb(
                scene_, cam_, width, height, n_pix_loc=n_pix_loc,
                spp_loc=spp_loc, chunk=C, window=window,
                max_depth=max_depth, attenuate=attenuate_emission,
                t_min=float(t_min), tile_rows=tile_rows,
                interpret=interpret, seed=jnp.uint32(seed),
                pix_base=pix_base, samp_base=samp_base,
                valid_pix=valid_pix, valid_cpp=valid_cpp)
            fb = jax.lax.psum(fb, "spp")
            return fb / jnp.float32(spp)

        with mesh:
            img = jax.jit(shard_render)(scene, cam)
        return img[:n_pix].reshape(height, width, 3)

    # ---- jnp wavefront fallback -------------------------------------------
    n_pix_loc = _ceil_div(n_pix, n_tiles)
    n_pix_pad = n_pix_loc * n_tiles
    local_spp = _ceil_div(spp, n_spp)
    pix_ids = jnp.arange(n_pix_pad, dtype=jnp.uint32) % jnp.uint32(
        max(n_pix, 1))

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P("tiles")),
        out_specs=P("tiles"),
    )
    def shard_render(scene_, cam_, pix):
        spp_idx = jax.lax.axis_index("spp")
        npx = pix.shape[0]
        lanes_pix = jnp.tile(pix, local_spp)
        samp = (spp_idx * local_spp
                + jnp.repeat(jnp.arange(local_spp, dtype=jnp.uint32), npx))
        state = rng_mod.seed_perf(lanes_pix, samp, seed)
        state, o, d, tmv = camera_rays(cam_, width, height, lanes_pix, state)
        _, rad = trace(scene_, o, d, tmv, state, max_depth,
                       attenuate_emission, t_min)
        valid = (samp < jnp.uint32(spp)).astype(jnp.float32)
        acc = jnp.stack([
            jnp.sum((rad.x * valid).reshape(local_spp, npx), axis=0),
            jnp.sum((rad.y * valid).reshape(local_spp, npx), axis=0),
            jnp.sum((rad.z * valid).reshape(local_spp, npx), axis=0),
        ], axis=-1)
        # combine sample-shard partial sums over ICI
        acc = jax.lax.psum(acc, "spp")
        return acc / jnp.float32(spp)

    with mesh:
        img = shard_render(scene, cam, pix_ids)
    return img[:n_pix].reshape(height, width, 3)


# ---------------------------------------------------------------------------
# Distributed differentiable training step (inverse rendering)
# ---------------------------------------------------------------------------

def make_train_step(static_scene, static_cam_tree, width: int, height: int,
                    local_spp: int, max_depth: int, mesh: Mesh,
                    lr: float = 0.05, t_min: float = 1e-3,
                    grad_filter=None, backend: str = "pallas",
                    tile_rows: Optional[int] = None,
                    interpret: Optional[bool] = None,
                    geometry_edge=None, edge_kwargs: Optional[dict] = None):
    """Build a jitted distributed SGD step for inverse rendering.

    params: float-partitioned (scene, camera) pytree (see diff.params).
    Pixels are sharded over "tiles", samples over "spp"; the scalar loss and
    parameter gradients are psum-reduced over both axes — gradient
    all-reduce across the slice.  Returns step(params, target, pix_ids) ->
    (params', loss).

    geometry_edge: optional sequence of sphere indices whose center/radius
    gradients get the SILHOUETTE boundary term added per step
    (diff.edge.sphere_silhouette_grad; the interior estimator alone cannot
    see visibility motion — docs/GRADIENTS.md).  Each shard evaluates the
    edge line integral against ITS pixels' loss cotangent; the tiles-psum
    then assembles the full-film integral.  Scope follows diff/edge.py:
    primary visibility, pinhole camera, static spheres.  edge_kwargs are
    forwarded (n_edge, spp_edge, max_depth, ...).

    backend="pallas" (default): forward = the QUEUE-driven recording
    megakernel, backward = the one-hot-MXU scan replay
    (diff.queued_vjp.render_grad_fb) — the production gradient route at
    work-queue forward speed.  Requires each shard's `pix_ids` slice to be
    a CONTIGUOUS pixel range (the canonical arange sharding is).
    backend="jnp": reverse-mode through the full jnp bounce fold
    (trace(differentiable=True)), kept as the cross-check oracle
    (tests/test_grad.py pins the two routes against each other and
    against finite differences)."""
    grad_f_cache = {}

    def get_grad_f(npx):
        if npx not in grad_f_cache:
            from ..diff.queued_vjp import render_grad_fb
            grad_f_cache[npx] = render_grad_fb(
                width, height, npx, local_spp, max_depth=max_depth,
                attenuate=True, t_min=t_min, seed=0, tile_rows=tile_rows,
                interpret=interpret)
        return grad_f_cache[npx]

    def local_loss(params, target, pix, spp_idx, tile_idx):
        scene_, cam_ = combine(params, (static_scene, static_cam_tree))
        npx = pix.shape[0]
        lanes_pix = jnp.tile(pix, local_spp)
        samp = (spp_idx.astype(jnp.uint32) * local_spp
                + jnp.repeat(jnp.arange(local_spp, dtype=jnp.uint32), npx))
        if backend == "pallas":
            img = get_grad_f(npx)(
                scene_, cam_, pix[0].astype(jnp.float32),
                (spp_idx * local_spp).astype(jnp.float32))
        else:
            state = rng_mod.seed_perf(lanes_pix, samp, 0)
            state, o, d, tmv = camera_rays(cam_, width, height, lanes_pix,
                                           state)
            _, rad = trace(scene_, o, d, tmv, state, max_depth,
                           attenuate_emission=True, t_min=t_min,
                           differentiable=True)
            img = jnp.stack([
                jnp.mean(rad.x.reshape(local_spp, npx), axis=0),
                jnp.mean(rad.y.reshape(local_spp, npx), axis=0),
                jnp.mean(rad.z.reshape(local_spp, npx), axis=0),
            ], axis=-1)
        err = img - target
        # mean over the GLOBAL pixel/sample population
        loss = jnp.sum(err * err) / jnp.float32(width * height * 3)
        return loss, err

    def add_edge_terms(params, err, pix, grads):
        """Silhouette boundary terms for the configured spheres, against
        this shard's loss cotangent dL/dimg = 2*err/(W*H*3)."""
        from ..diff.edge import sphere_silhouette_grad
        scene_, cam_ = combine(params, (static_scene, static_cam_tree))
        ct = jnp.zeros((width * height, 3), jnp.float32)
        ct = ct.at[pix.astype(jnp.int32)].set(
            2.0 * err / jnp.float32(width * height * 3))
        ct = ct.reshape(height, width, 3)
        kw = dict(edge_kwargs or {})
        scene_g, cam_g = grads
        sph_g = scene_g.spheres
        for si in geometry_edge:
            eg = sphere_silhouette_grad(scene_, cam_, width, height,
                                        int(si), ct, **kw)
            c0 = sph_g.c0
            c0 = type(c0)(c0.x.at[si].add(eg.center[0]),
                          c0.y.at[si].add(eg.center[1]),
                          c0.z.at[si].add(eg.center[2]))
            sph_g = sph_g._replace(
                c0=c0, radius=sph_g.radius.at[si].add(eg.radius))
        return (scene_g._replace(spheres=sph_g), cam_g)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P("tiles"), P("tiles")),
        out_specs=(P(), P()),
        # pallas_call can't annotate varying-mesh-axes metadata yet (same
        # situation as render_sharded's wq body): body is local + psums.
        check_vma=False,
    )
    def sharded_grad(params, target, pix):
        spp_idx = jax.lax.axis_index("spp")
        tile_idx = jax.lax.axis_index("tiles")
        (loss, err), grads = jax.value_and_grad(local_loss, has_aux=True)(
            params, target, pix, spp_idx, tile_idx)
        if geometry_edge:
            grads = add_edge_terms(params, err, pix, grads)
        # all-reduce: tiles sum partial pixel populations; spp averages
        # independent MC estimates of the same gradient.
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, "tiles") if g is not None else None,
            grads)
        grads = jax.tree_util.tree_map(
            lambda g: (jax.lax.pmean(g, "spp")
                       if g is not None else None), grads)
        loss = jax.lax.psum(loss, "tiles")
        loss = jax.lax.pmean(loss, "spp")
        return grads, loss

    @jax.jit
    def step(params, target, pix_ids):
        with mesh:
            grads, loss = sharded_grad(params, target, pix_ids)
        if grad_filter is not None:
            # restrict optimization to a parameter subset (e.g. continuous
            # material params; geometry gradients are interior-only and may
            # need silhouette-aware estimators)
            grads = grad_filter(grads)
        new_params = jax.tree_util.tree_map(
            lambda p, g: p - lr * g if p is not None else None,
            params, grads, is_leaf=lambda x: x is None)
        return new_params, loss

    return step


def scene_camera_params(scene: T.Scene, cam: Camera):
    """Partition (scene, camera) into differentiable params + statics."""
    params, static = partition((scene, cam))
    scene_p, cam_p = params
    scene_s, cam_s = static
    return (scene_p, cam_p), (scene_s, cam_s)
