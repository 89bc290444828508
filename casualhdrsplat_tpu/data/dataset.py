"""Dataset container + loaders (SURVEY.md L1 interface contract):

    Dataset -> {images[N,H,W,3], timestamps[N], intrinsics, init poses[N],
                sparse_points[M,3+3]}

Sources: synthetic fixtures, COLMAP sparse models (+image dir), and video
frames (decoded offline to an image dir; SURVEY.md §3.5 keeps decode/SfM
external).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from casualhdrsplat_tpu.config import DataConfig
from casualhdrsplat_tpu.data import colmap
from casualhdrsplat_tpu.geometry.camera import Camera


@dataclass
class Dataset:
    images: np.ndarray  # [N,H,W,3] float32 in [0,1]
    timestamps: np.ndarray  # [N] float32 (seconds or frame units)
    viewmats: np.ndarray  # [N,4,4] world->cam init poses
    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int
    points_xyz: np.ndarray  # [M,3] SfM sparse points
    points_rgb: np.ndarray  # [M,3] in [0,1]
    train_indices: np.ndarray = field(default=None)
    eval_indices: np.ndarray = field(default=None)
    # Ground-truth sharp LDR frames at each frame's mid-exposure pose, when
    # the source provides them (synthetic fixtures; real captures rarely do).
    # Enables the deblurred-render evaluation path (SURVEY.md C20,
    # teaser.png c.2 "sharpen the train images").
    sharp_images: Optional[np.ndarray] = None

    def __post_init__(self):
        n = len(self.images)
        if self.train_indices is None:
            self.train_indices = np.arange(n)
        if self.eval_indices is None:
            self.eval_indices = np.arange(0, n, max(n, 1))[:0]

    @property
    def num_frames(self) -> int:
        return len(self.images)

    def camera(self, index: Optional[int] = None) -> Camera:
        viewmat = self.viewmats[index] if index is not None else np.eye(4)
        return Camera.make(
            viewmat, self.fx, self.fy, self.cx, self.cy, self.width, self.height
        )

    def split(self, eval_every: int) -> "Dataset":
        idx = np.arange(self.num_frames)
        if eval_every > 0:
            self.eval_indices = idx[:: eval_every]
            self.train_indices = np.setdiff1d(idx, self.eval_indices)
        return self

    def downscaled(self, k: int) -> "Dataset":
        """A k-times-downscaled copy (area-average box filter, intrinsics
        scaled to match) sharing poses/timestamps/points — the COARSE rung
        of the multi-resolution training curriculum (round 4: the at-spec
        pose-recovery stage runs at reduced resolution, which widens the
        photometric alignment basin the way loss-blur c2f tried to, at
        1/k^2 the step cost and without the fat-splat pathology loss-blur
        induced).  Keeps the train/eval split."""
        if k <= 1:
            return self

        def box(imgs):
            if imgs is None:
                return None
            n, h, w, c = imgs.shape
            hd, wd = h // k, w // k
            x = imgs[:, : hd * k, : wd * k]
            return (
                x.reshape(n, hd, k, wd, k, c).mean(axis=(2, 4)).astype(imgs.dtype)
            )

        out = Dataset(
            images=box(self.images),
            timestamps=self.timestamps,
            viewmats=self.viewmats,
            fx=self.fx / k, fy=self.fy / k,
            cx=self.cx / k, cy=self.cy / k,
            width=self.width // k, height=self.height // k,
            points_xyz=self.points_xyz, points_rgb=self.points_rgb,
            sharp_images=box(self.sharp_images),
        )
        out.train_indices = self.train_indices
        out.eval_indices = self.eval_indices
        return out

    def scene_extent(self) -> float:
        if len(self.points_xyz):
            center = self.points_xyz.mean(axis=0)
            return float(np.quantile(np.linalg.norm(self.points_xyz - center, axis=1), 0.97))
        cams = self.viewmats[:, :3, 3]
        return float(np.linalg.norm(cams - cams.mean(0), axis=1).max() + 1.0)


def _load_image(path: str, downscale: int = 1, background: float = 0.0) -> np.ndarray:
    """Load an image as [H,W,3] float32 in [0,1].  RGBA inputs are alpha-
    composited onto `background` (rgb*a + (1-a)*bg — NeRF-synthetic frames
    carry meaning only in alpha-premultiplied form; ADVICE r1, medium)."""
    try:
        import imageio.v3 as iio

        img = iio.imread(path)
    except ImportError:
        from PIL import Image

        img = np.asarray(Image.open(path))
    img = img.astype(np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    if img.shape[-1] == 4:
        alpha = img[..., 3:4]
        img = img[..., :3] * alpha + (1.0 - alpha) * background
    else:
        img = img[..., :3]
    if downscale > 1:
        # area-average (box filter), not naive subsampling — strided
        # slicing aliases high-frequency content; the SfM lineage resizes
        # with averaging.  Trailing rows/cols that don't fill a full
        # downscale block are cropped (matches the // intrinsics scaling).
        h, w = img.shape[:2]
        hd, wd = h // downscale, w // downscale
        img = img[: hd * downscale, : wd * downscale]
        img = img.reshape(hd, downscale, wd, downscale, 3).mean(axis=(1, 3))
    return img


def load_colmap_dataset(
    path: str,
    images_dir: Optional[str] = None,
    downscale: int = 1,
    timestamps: Optional[np.ndarray] = None,
    fps: Optional[float] = None,
) -> Dataset:
    """Load a COLMAP reconstruction.  `path` contains `sparse/0` (or is the
    model dir itself); `images_dir` defaults to `<path>/images`.

    Frame timestamps default to the frame NUMBER parsed from each
    REGISTERED image name (divided by `fps` when given) — correct for
    constant-rate video frames even when SfM dropped some of them
    (SURVEY.md C19; ADVICE r1, low).  An explicit `timestamps` array must
    align with the registered images in name-sorted order.
    """
    model_dir = path
    for cand in ("sparse/0", "sparse", "."):
        d = os.path.join(path, cand)
        if os.path.exists(os.path.join(d, "cameras.bin")) or os.path.exists(
            os.path.join(d, "cameras.txt")
        ):
            model_dir = d
            break
    cams, col_images, xyz, rgb = colmap.load_model(model_dir)
    images_dir = images_dir or os.path.join(path, "images")

    ordered = sorted(col_images.values(), key=lambda im: im.name)
    cam0 = cams[ordered[0].camera_id]
    fx, fy, cx, cy = cam0.pinhole()
    s = 1.0 / downscale
    imgs: List[np.ndarray] = []
    viewmats: List[np.ndarray] = []
    uv_map = None
    undistorting = cam0.has_distortion()
    if undistorting:
        # resample onto the ideal pinhole grid so the rasterizer's
        # pinhole camera stays exact (SURVEY.md C19; the lineage runs
        # COLMAP image_undistorter offline instead).  The sampling map
        # depends only on the camera: built once, reused per frame.
        from casualhdrsplat_tpu.data import undistort as und
    for im in ordered:
        fp = os.path.join(images_dir, im.name)
        img = _load_image(fp, downscale)
        if undistorting:
            if uv_map is None:
                uv_map = und.undistort_map(
                    cam0.model, cam0.params,
                    img.shape[1], img.shape[0],
                    fx * s, fy * s, cx * s, cy * s)
            img = und.undistort_image(
                img, cam0.model, cam0.params,
                fx * s, fy * s, cx * s, cy * s, uv_map=uv_map)
        imgs.append(img)
        viewmats.append(im.viewmat())
    if timestamps is None:
        from casualhdrsplat_tpu.data.video import timestamps_from_names

        timestamps = timestamps_from_names(
            [im.name for im in ordered], fps or 1.0
        )
    return Dataset(
        images=np.stack(imgs),
        timestamps=np.asarray(timestamps, np.float32),
        viewmats=np.stack(viewmats).astype(np.float32),
        fx=fx * s,
        fy=fy * s,
        cx=cx * s,
        cy=cy * s,
        width=imgs[0].shape[1],
        height=imgs[0].shape[0],
        points_xyz=xyz,
        points_rgb=rgb,
    )


def make_synthetic_dataset(seed: int = 0, **kwargs) -> Dataset:
    """Synthetic casual-video dataset (ground truth known) for the config
    ladder and smoke tests."""
    from casualhdrsplat_tpu.data import synthetic

    rng = np.random.default_rng(seed)
    video = synthetic.make_casual_video(rng, **kwargs)
    n = video.images.shape[0]
    # frame-time poses: on the dense grid frame i sits at knot 2 + i*k
    kpf = int(kwargs.get("knots_per_frame", 1))
    mats = np.asarray(
        [np.asarray(video.knots[2 + i * kpf]) for i in range(n)], np.float32
    )
    cam = video.camera
    pts = np.asarray(video.cloud.means3d)
    cols = np.clip(np.asarray(video.cloud.colors), 0.0, 1.0)
    return Dataset(
        images=np.asarray(video.images),
        timestamps=np.asarray(video.timestamps),
        viewmats=mats,
        fx=float(cam.fx),
        fy=float(cam.fy),
        cx=float(cam.cx),
        cy=float(cam.cy),
        width=cam.width,
        height=cam.height,
        points_xyz=pts,
        points_rgb=cols,
        sharp_images=np.asarray(video.sharp_ldr),
    )


def load_dataset(cfg: DataConfig) -> Dataset:
    if cfg.source == "synthetic":
        return make_synthetic_dataset().split(cfg.eval_every)
    if cfg.source in ("colmap", "video"):
        return load_colmap_dataset(cfg.path, downscale=cfg.downscale).split(
            cfg.eval_every
        )
    if cfg.source == "blender":
        from casualhdrsplat_tpu.data.blender import load_blender_dataset

        return load_blender_dataset(cfg.path, downscale=cfg.downscale).split(
            cfg.eval_every
        )
    raise ValueError(f"unknown data source {cfg.source!r}")
