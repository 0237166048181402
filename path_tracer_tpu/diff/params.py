"""Parameter partitioning for differentiable rendering.

The renderer is differentiable end-to-end w.r.t. every float quantity in the
scene + camera pytrees (material albedos/fuzz/IOR, sphere centers/radii, rect
bounds, triangle vertices, medium density, camera pose/optics).  Integer
leaves (material ids, texture metadata, the uint8 atlas) are structural:
``partition`` splits a pytree into (float_params, static) and ``combine``
reassembles, so optimizers see a clean all-float pytree.

Discrete MC decisions (hit selection, dielectric branch, medium event
acceptance) are detached by construction — booleans/argmin indices carry no
gradient — while the continuous geometry/shading terms selected through
``jnp.where`` propagate, the standard detached-sampling estimator for
differentiable path tracing.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp


def _is_float_leaf(x) -> bool:
    return isinstance(x, jnp.ndarray) and jnp.issubdtype(x.dtype,
                                                         jnp.floating)


def partition(tree: Any) -> Tuple[Any, Any]:
    """Split into (params, static): params has None at non-float leaves,
    static has None at float leaves."""
    params = jax.tree_util.tree_map(
        lambda x: x if _is_float_leaf(x) else None, tree)
    static = jax.tree_util.tree_map(
        lambda x: None if _is_float_leaf(x) else x, tree)
    return params, static


def combine(params: Any, static: Any) -> Any:
    """Inverse of partition."""
    return jax.tree_util.tree_map(
        lambda p, s: p if p is not None else s, params, static,
        is_leaf=lambda x: x is None)
