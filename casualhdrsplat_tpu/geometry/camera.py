"""Camera model (pinhole) as a plain pytree.

Reference-lineage equivalent: nerfstudio `Cameras` + gsplat camera structs
(SURVEY.md L2).  Static fields (width/height) are Python ints so jitted
renderers trace with static image shapes, as XLA requires.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """Pinhole camera with a world-to-camera extrinsic.

    viewmat: [4,4] world->camera (X_cam = R X_world + t).
    fx, fy, cx, cy: intrinsics in pixels (traced, so pose optimization can
    in principle extend to intrinsics).
    width/height: static Python ints (metadata).
    """

    viewmat: jnp.ndarray
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))

    @staticmethod
    def make(viewmat, fx, fy, cx, cy, width, height) -> "Camera":
        f32 = lambda v: jnp.asarray(v, dtype=jnp.float32)
        return Camera(
            viewmat=f32(viewmat),
            fx=f32(fx),
            fy=f32(fy),
            cx=f32(cx),
            cy=f32(cy),
            width=int(width),
            height=int(height),
        )

    def with_viewmat(self, viewmat) -> "Camera":
        return dataclasses.replace(self, viewmat=jnp.asarray(viewmat, jnp.float32))

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.height, self.width)

    def camtoworld(self) -> jnp.ndarray:
        from casualhdrsplat_tpu.geometry import lie

        return lie.se3_inverse(self.viewmat)


def look_at(eye, target, up=(0.0, 1.0, 0.0)) -> jnp.ndarray:
    """World-to-camera viewmat for a camera at `eye` looking at `target`.

    Camera convention: +z forward (into the scene), +x right, +y down —
    the COLMAP/OpenCV convention used throughout the splatting lineage.
    """
    eye = jnp.asarray(eye, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    fwd = target - eye
    fwd = fwd / jnp.linalg.norm(fwd)
    right = jnp.cross(fwd, up)
    right = right / jnp.linalg.norm(right)
    down = jnp.cross(fwd, right)
    R = jnp.stack([right, down, fwd], axis=0)  # world->cam rotation
    from casualhdrsplat_tpu.geometry import lie

    t = -lie.mat_vec(R, eye)

    return lie.rt_to_mat(R, t)
