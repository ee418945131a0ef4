"""Pytree dataclasses shared across the framework.

These replace the reference's ray/result containers:

- :class:`Rays`   <- ``RayGroup<sharedOrigin,hasMask>`` (src/ray_group.h:74-160).
  Instead of compile-time template specialization on shared-origin/mask, a
  wavefront of rays is always stored SoA with an explicit ``tmax`` array;
  inactive rays are encoded exactly like the reference encodes them — with a
  negative max distance sentinel (src/ray_group.h:382: "distance below 0.0
  means that the ray is masked").
- :class:`Hit`    <- ``Isct<Real,size,flags>`` (src/rtbase.h:210-306). The
  compile-time member flags collapse to plain optional-by-convention arrays.
- :class:`Camera` <- ``Camera`` (src/camera.h:7-14).
- :class:`Light`  <- ``Light`` (src/light.h:6-18), with the derived
  ``iRadius``/``radSq`` computed on the fly.
- :class:`RenderOpts` <- the ``gVals[16]`` runtime toggle array +
  per-call options (src/rtbase.h:31, src/render.h Options).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls) if not f.metadata.get("static")]
    static = [f.name for f in dataclasses.fields(cls) if f.metadata.get("static")]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=static)
    return cls


def static_field(**kw):
    return dataclasses.field(metadata={"static": True}, **kw)


@_pytree_dataclass
class Rays:
    """A wavefront of rays, SoA.

    origin/dir: float32[..., 3]; tmax: float32[...] with tmax < 0 marking a
    masked-out ray (reference sentinel, src/ray_group.h:382 and
    src/scene_inl.h:190). ``idir`` is derived lazily via safe_inv.
    """

    origin: jnp.ndarray
    dir: jnp.ndarray
    tmax: jnp.ndarray

    @property
    def active(self):
        return self.tmax >= 0.0

    def count(self):
        return int(np.prod(self.tmax.shape))


@_pytree_dataclass
class Hit:
    """Intersection record for a wavefront (reference ``Isct``).

    dist: float32[...] — hit distance, +BIG when no hit, -inf-like negative
      for masked rays (matching the reference's sentinel convention).
    tri: int32[...]   — flat element id (reference fElement member);
      0 where there is no hit (reference initializes objId/elementId to 0,
      src/scene_inl.h:32).
    obj: int32[...]   — instance id for two-level (DBVH) scenes; 0 otherwise.
    bary: float32[..., 2] — (u, v) barycentric weights of vertices 1 and 2
      w.r.t. vertex 0, i.e. the reference's Barycentric().z/.y
      (src/triangle.h:166-179).
    """

    dist: jnp.ndarray
    tri: jnp.ndarray
    bary: jnp.ndarray
    obj: Optional[jnp.ndarray] = None

    @property
    def valid(self):
        from .vecmath import BIG

        return (self.dist >= 0.0) & (self.dist < BIG)


@_pytree_dataclass
class Camera:
    """Pinhole camera basis (reference src/camera.h:7-14).

    ``right``/``up``/``front`` are the (unit) view basis, ``plane_dist`` the
    focal distance in multiples of image height (reference passes it straight
    into RayGenerator, src/render.cpp:62).
    """

    pos: jnp.ndarray
    right: jnp.ndarray
    up: jnp.ndarray
    front: jnp.ndarray
    plane_dist: jnp.ndarray

    @staticmethod
    def look_at(pos, target, up=(0.0, 1.0, 0.0), plane_dist=1.0) -> "Camera":
        pos = jnp.asarray(pos, jnp.float32)
        target = jnp.asarray(target, jnp.float32)
        up = jnp.asarray(up, jnp.float32)
        front = target - pos
        front = front / jnp.linalg.norm(front)
        right = jnp.cross(front, up)
        right = right / jnp.linalg.norm(right)
        true_up = jnp.cross(right, front)
        return Camera(
            pos=pos,
            right=right,
            up=true_up,
            front=front,
            plane_dist=jnp.float32(plane_dist),
        )


@_pytree_dataclass
class Light:
    """Point light with radius falloff (reference src/light.h:6-18).

    Stored batched: pos/color are float32[L, 3], radius float32[L], so a whole
    light set is one pytree leaf group (lights loop vectorizes or unrolls in
    the integrator).
    """

    pos: jnp.ndarray
    color: jnp.ndarray
    radius: jnp.ndarray

    @property
    def i_radius(self):
        return 1.0 / self.radius

    @property
    def rad_sq(self):
        return self.radius * self.radius

    @staticmethod
    def make(pos, color, radius) -> "Light":
        pos = jnp.atleast_2d(jnp.asarray(pos, jnp.float32))
        color = jnp.atleast_2d(jnp.asarray(color, jnp.float32))
        radius = jnp.atleast_1d(jnp.asarray(radius, jnp.float32))
        return Light(pos=pos, color=color, radius=radius)

    @staticmethod
    def stack(lights: list) -> "Light":
        """Concatenate several Light records into one multi-light set."""
        return Light(
            pos=jnp.concatenate([l.pos for l in lights]),
            color=jnp.concatenate([l.color for l in lights]),
            radius=jnp.concatenate([l.radius for l in lights]),
        )

    def __len__(self):
        return self.pos.shape[0]


@_pytree_dataclass
class RenderOpts:
    """Render-time options — the rebuild of the reference's ``gVals[16]``
    F-key-toggled global int array that is broadcast to every node each frame
    (src/rtbase.h:31, src/client.cpp:283-292), plus static per-call options.

    Static fields change the compiled program (XLA recompile on change, like
    the reference's compile-time enums); traced fields reach kernels as
    scalars and can change every frame for free.
    """

    # static (compile-time) switches
    shading: bool = static_field(default=True)  # ~gVals[4] "no shading" view
    reflections: bool = static_field(default=True)  # gVals[5]
    transparency: bool = static_field(default=True)
    shadows: bool = static_field(default=True)
    textures: bool = static_field(default=True)
    stats: bool = static_field(default=False)  # gVals[2] stats overlay
    supersample: bool = static_field(default=False)  # gVals[9] 4x AA
    max_bounces: int = static_field(default=1)  # cache.reflections < 1 bound
    photons: bool = static_field(default=False)  # photon-map radiance term
    # (the scene_trace photon variant, reference photons.cpp:68-195)
    tex_filter: str = static_field(default="point")  # "point" | "bilinear"
    # | "sat" — the NewSampler choice (sampling/sampler.cpp:9-44):
    # PointSampler / BilinearSampler / SATSampler ("sat" needs
    # scene.tex_sat, see scene.with_sat)
    # traced scalars. Plain float default (not jnp.float32): RenderOpts()
    # appears as a def-time default argument across the render modules, and
    # materializing a device scalar there initializes the XLA backend at
    # import — which breaks jax.distributed.initialize (it must run before
    # any backend touch; see parallel/distributed.py).
    ambient: float = 0.1
    photon_exposure: float = 1.0  # scales the gathered photon irradiance


__all__ = ["Rays", "Hit", "Camera", "Light", "RenderOpts", "static_field"]
