"""Data layer tests (SURVEY.md C19, L1 contract): COLMAP binary round-trip
and the synthetic casual-video fixture."""

import os
import struct

import numpy as np

from casualhdrsplat_tpu.data import colmap, dataset, synthetic


def write_fake_colmap_bin(model_dir, names=(b"frame_000.png", b"frame_001.png")):
    os.makedirs(model_dir, exist_ok=True)
    # cameras.bin: one PINHOLE camera
    with open(os.path.join(model_dir, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 64, 48))
        f.write(struct.pack("<4d", 60.0, 61.0, 32.0, 24.0))
    # images.bin: two images
    with open(os.path.join(model_dir, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", 2))
        for i, name in enumerate(names, start=1):
            f.write(struct.pack("<idddddddi", i, 1.0, 0.0, 0.0, 0.0,
                                0.1 * i, 0.2, 0.3, 1))
            f.write(name + b"\x00")
            f.write(struct.pack("<Q", 1))  # one 2D point
            f.write(struct.pack("<ddq", 1.0, 2.0, -1))
    # points3D.bin: three points
    with open(os.path.join(model_dir, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", 3))
        for pid in range(3):
            f.write(struct.pack("<QdddBBBd", pid, pid * 1.0, 0.5, -0.5,
                                255, 128, 0, 0.1))
            f.write(struct.pack("<Q", 2))
            f.write(struct.pack("<ii", 1, 0) + struct.pack("<ii", 2, 0))


def test_colmap_binary_roundtrip(tmp_path):
    model_dir = str(tmp_path / "sparse" / "0")
    write_fake_colmap_bin(model_dir)
    cams, images, xyz, rgb = colmap.load_model(model_dir)
    assert cams[1].model == "PINHOLE"
    assert cams[1].pinhole() == (60.0, 61.0, 32.0, 24.0)
    assert len(images) == 2
    im = images[1]
    assert im.name == "frame_000.png"
    np.testing.assert_allclose(im.viewmat()[:3, :3], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(im.viewmat()[:3, 3], [0.1, 0.2, 0.3], atol=1e-6)
    assert xyz.shape == (3, 3)
    np.testing.assert_allclose(rgb[0], [1.0, 128 / 255.0, 0.0], atol=1e-6)


def test_load_image_rgba_composites_background(tmp_path):
    """RGBA frames composite rgb*a + (1-a)*bg instead of silently dropping
    alpha (ADVICE r1: NeRF-synthetic transparent backgrounds)."""
    from PIL import Image

    rgba = np.zeros((4, 4, 4), np.uint8)
    rgba[..., 0] = 200  # red
    rgba[..., 3] = 0  # fully transparent
    rgba[0, 0] = [200, 0, 0, 255]  # one opaque pixel
    path = str(tmp_path / "t.png")
    Image.fromarray(rgba, "RGBA").save(path)

    on_white = dataset._load_image(path, background=1.0)
    on_black = dataset._load_image(path, background=0.0)
    np.testing.assert_allclose(on_white[1, 1], [1.0, 1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(on_black[1, 1], [0.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(on_white[0, 0], [200 / 255.0, 0.0, 0.0], atol=1e-6)


def test_colmap_timestamps_from_registered_names(tmp_path):
    """Timestamps come from the frame numbers of REGISTERED images, so an
    SfM-dropped frame leaves a gap instead of shifting later frames
    (ADVICE r1, low)."""
    from PIL import Image

    model_dir = str(tmp_path / "sparse" / "0")
    write_fake_colmap_bin(model_dir, names=(b"frame_000.png", b"frame_002.png"))
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    for n in ("frame_000.png", "frame_002.png"):
        Image.fromarray(np.zeros((48, 64, 3), np.uint8)).save(str(img_dir / n))
    ds = dataset.load_colmap_dataset(str(tmp_path), fps=10.0)
    np.testing.assert_allclose(ds.timestamps, [0.0, 0.2], atol=1e-6)


def test_timestamps_fall_back_to_ordinal_for_photo_names():
    """Date/time-stamped photo names must NOT be read as frame counters:
    the digits would produce a wildly non-uniform (even non-monotone)
    timeline for the SE(3) spline.  Only counter-like sequences
    (all-numbered, increasing, dense) use the parsed numbers."""
    from casualhdrsplat_tpu.data.video import timestamps_from_names

    # date-stamped photos: non-monotone, huge gaps -> ordinal 0,1,2
    ts = timestamps_from_names(
        ["IMG_20230401_123456.jpg", "IMG_20230402_091011.jpg",
         "IMG_20230402_151617.jpg"], fps=1.0)
    np.testing.assert_allclose(ts, [0.0, 1.0, 2.0])
    # sparse unrelated ids (gap 1000x) -> ordinal
    ts = timestamps_from_names(["a_1.png", "a_5000.png"], fps=1.0)
    np.testing.assert_allclose(ts, [0.0, 1.0])
    # counter with an SfM-dropped frame keeps the gap
    ts = timestamps_from_names(
        ["f_000.png", "f_001.png", "f_003.png"], fps=1.0)
    np.testing.assert_allclose(ts, [0.0, 1.0, 3.0])


def test_synthetic_video_fixture(rng):
    video = synthetic.make_casual_video(
        rng, n_gaussians=50, n_frames=4, n_virtual=3, size=24
    )
    assert video.images.shape == (4, 24, 24, 3)
    assert float(video.images.min()) >= 0.0
    assert float(video.images.max()) <= 1.0
    assert video.exposures.shape == (4,)
    # blur: blurred frame differs from the sharp mid-exposure render
    sharp_ldr = np.clip(
        np.asarray(video.sharp_hdr[0]) * float(video.exposures[0]), 0, 1
    ) ** (1 / 2.2)
    assert np.abs(np.asarray(video.images[0]) - sharp_ldr).max() > 1e-3


def test_synthetic_video_fast_renderer_matches_oracle():
    """renderer="fast" (production rasterizer GT for at-spec fixtures)
    must reproduce the oracle-rendered fixture at small scale."""
    kw = dict(n_gaussians=50, n_frames=3, n_virtual=3, size=24)
    vo = synthetic.make_casual_video(np.random.default_rng(9), **kw)
    vf = synthetic.make_casual_video(
        np.random.default_rng(9), renderer="fast", **kw
    )
    np.testing.assert_allclose(
        np.asarray(vo.images), np.asarray(vf.images), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(vo.sharp_ldr), np.asarray(vf.sharp_ldr), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(vo.exposures), np.asarray(vf.exposures), atol=0
    )


def test_synthetic_dataset_split():
    ds = dataset.make_synthetic_dataset(
        seed=0, n_gaussians=40, n_frames=6, n_virtual=2, size=16
    ).split(3)
    assert ds.num_frames == 6
    assert set(ds.eval_indices) == {0, 3}
    assert len(ds.train_indices) == 4
    assert ds.scene_extent() > 0
    cam = ds.camera(1)
    assert cam.width == 16 and cam.height == 16


def test_load_image_downscale_area_averages(tmp_path):
    """downscale must box-filter (average), not stride-subsample: a 0/255
    checker at downscale=2 averages to 0.5; subsampling would return
    pure 0s or 255s.  Odd trailing rows/cols are cropped."""
    from PIL import Image

    img = np.zeros((5, 6, 3), np.uint8)
    img[::2, ::2] = 255
    img[1::2, 1::2] = 255
    path = str(tmp_path / "checker.png")
    Image.fromarray(img, "RGB").save(path)

    out = dataset._load_image(path, downscale=2)
    assert out.shape == (2, 3, 3)  # 5//2 x 6//2
    np.testing.assert_allclose(out, 0.5, atol=1e-6)


def test_undistort_roundtrip_radial():
    """Synthesize a distorted capture of a smooth scene via iterative
    point UNdistortion, then check undistort_image recovers the ideal
    pinhole view (data/undistort.py; COLMAP image_undistorter parity)."""
    from casualhdrsplat_tpu.data import undistort as und

    h, w = 48, 64
    fx = fy = 55.0
    cx, cy = w / 2.0, h / 2.0
    params = np.array([fx, cx, cy, -0.15])  # SIMPLE_RADIAL, barrel

    def scene(xn, yn):
        v = 0.5 + 0.3 * np.sin(4.0 * xn) * np.cos(5.0 * yn) + 0.15 * xn
        return np.repeat(np.clip(v, 0, 1)[..., None], 3, -1).astype(np.float32)

    u, v = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
    # distorted capture: pixel p sees the ray whose DISTORTED projection
    # lands at p, i.e. scene at undistort(norm(p)).
    xu, yu = und.undistort_points("SIMPLE_RADIAL", params,
                                  (u - cx) / fx, (v - cy) / fy)
    captured = scene(xu, yu)
    # iterative inversion must actually invert the forward model
    xd, yd = und.distort("SIMPLE_RADIAL", params, xu, yu)
    np.testing.assert_allclose(xd, (u - cx) / fx, atol=1e-9)
    np.testing.assert_allclose(yd, (v - cy) / fy, atol=1e-9)

    out = und.undistort_image(captured, "SIMPLE_RADIAL", params,
                              fx, fy, cx, cy)
    ideal = scene((u - cx) / fx, (v - cy) / fy)
    # compare away from the border (corners clamp outside the capture)
    err = np.abs(out[8:-8, 8:-8] - ideal[8:-8, 8:-8]).max()
    assert err < 0.01, err


def test_undistort_identity_and_models():
    """Zero distortion terms are a no-op for every supported model; each
    model's forward map runs and bends off-axis points."""
    from casualhdrsplat_tpu.data import undistort as und

    x = np.linspace(-0.4, 0.4, 9)
    y = np.linspace(-0.3, 0.3, 9)
    zero = {
        "SIMPLE_RADIAL": np.array([50, 10, 10, 0.0]),
        "RADIAL": np.array([50, 10, 10, 0.0, 0.0]),
        "OPENCV": np.array([50, 50, 10, 10, 0, 0, 0, 0.0]),
        "FULL_OPENCV": np.zeros(12) + [50, 50, 10, 10, 0, 0, 0, 0, 0, 0, 0, 0],
        "FOV": np.array([50, 50, 10, 10, 0.0]),
    }
    for model, p in zero.items():
        xd, yd = und.distort(model, p, x, y)
        np.testing.assert_allclose(xd, x, atol=1e-7)
        np.testing.assert_allclose(yd, y, atol=1e-7)
    bent = {
        "OPENCV": np.array([50, 50, 10, 10, -0.1, 0.01, 1e-3, -1e-3]),
        "OPENCV_FISHEYE": np.array([50, 50, 10, 10, -0.05, 0.01, 0, 0]),
        "SIMPLE_RADIAL_FISHEYE": np.array([50, 10, 10, -0.05]),
        "RADIAL_FISHEYE": np.array([50, 10, 10, -0.05, 0.01]),
        "FOV": np.array([50, 50, 10, 10, 0.6]),
    }
    for model, p in bent.items():
        xd, yd = und.distort(model, p, x + 0.3, y + 0.2)
        assert np.abs(xd - (x + 0.3)).max() > 1e-4, model
        xu, yu = und.undistort_points(model, p, xd, yd)
        np.testing.assert_allclose(xu, x + 0.3, atol=1e-6)
        np.testing.assert_allclose(yu, y + 0.2, atol=1e-6)


def test_colmap_loader_undistorts(tmp_path):
    """A SIMPLE_RADIAL COLMAP model triggers undistortion at load; with a
    pure-barrel lens the loaded frame differs from the raw capture but
    the center pixel is preserved."""
    import struct as _s

    from PIL import Image

    model_dir = str(tmp_path / "sparse" / "0")
    os.makedirs(model_dir, exist_ok=True)
    with open(os.path.join(model_dir, "cameras.bin"), "wb") as f:
        f.write(_s.pack("<Q", 1))
        f.write(_s.pack("<iiQQ", 1, 2, 64, 48))  # model 2 = SIMPLE_RADIAL
        f.write(_s.pack("<4d", 55.0, 32.0, 24.0, -0.2))
    with open(os.path.join(model_dir, "images.bin"), "wb") as f:
        f.write(_s.pack("<Q", 1))
        f.write(_s.pack("<idddddddi", 1, 1.0, 0.0, 0.0, 0.0, 0, 0, 0, 1))
        f.write(b"frame_000.png\x00")
        f.write(_s.pack("<Q", 0))
    with open(os.path.join(model_dir, "points3D.bin"), "wb") as f:
        f.write(_s.pack("<Q", 0))
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng_img = np.random.default_rng(0).uniform(0, 255, (48, 64, 3))
    Image.fromarray(rng_img.astype(np.uint8)).save(str(img_dir / "frame_000.png"))

    ds = dataset.load_colmap_dataset(str(tmp_path))
    raw = dataset._load_image(str(img_dir / "frame_000.png"))
    assert not np.allclose(ds.images[0], raw)
    np.testing.assert_allclose(ds.images[0][24, 32], raw[24, 32], atol=0.03)


def test_structured_cloud_is_piecewise_smooth():
    from casualhdrsplat_tpu.data import synthetic

    rng = np.random.default_rng(0)
    cloud = synthetic.structured_cloud(rng, 4000, extent=2.2, hdr_max=3.0)
    n = cloud.means3d.shape[0]
    assert abs(n - 4000) < 500
    for leaf in cloud:
        assert np.all(np.isfinite(np.asarray(leaf)))
    # spatial color correlation: nearest-neighbor color distance must be
    # far below the random-pair distance (confetti has ratio ~1)
    pts = np.asarray(cloud.means3d)
    col = np.asarray(cloud.colors)
    sub = np.arange(0, n, 7)[:400]
    d2 = ((pts[sub, None] - pts[None]) ** 2).sum(-1)  # nn over ALL points
    d2[np.arange(len(sub)), sub] = np.inf
    nn = d2.argmin(1)
    nn_dist = np.linalg.norm(col[sub] - col[nn], axis=1).mean()
    rand = np.linalg.norm(col[sub] - col[np.roll(sub, 17)], axis=1).mean()
    # (confetti scores ~1.0 here; at 4k splats the mid-frequency texture
    # sits near the sampling density, so the correlation is moderate)
    assert nn_dist < 0.6 * rand, (nn_dist, rand)
    # the HDR window exists: some radiance above the LDR clip
    assert (col.max(-1) > 1.5).sum() > 10


def test_casual_video_shake_produces_blur():
    from casualhdrsplat_tpu.data import synthetic
    from casualhdrsplat_tpu.models import losses
    import jax.numpy as jnp

    kw = dict(
        n_gaussians=300, n_frames=3, n_virtual=5, size=48,
        angle_span=0.3, exposure_range=(0.3, 0.6), crf_gamma=2.2,
        extent=1.0, knots_per_frame=3,
    )
    rng = np.random.default_rng(4)
    still = synthetic.make_casual_video(rng, shake_rot=0.0, **kw)
    rng = np.random.default_rng(4)
    shaken = synthetic.make_casual_video(
        rng, shake_rot=0.15, shake_trans=0.05, **kw
    )

    def in_psnr(v):
        return float(np.mean([
            losses.psnr(v.images[i], v.sharp_ldr[i])
            for i in range(v.images.shape[0])
        ]))

    # shake must measurably blur the inputs vs the mid-exposure sharp GT
    assert in_psnr(shaken) < in_psnr(still) - 3.0, (in_psnr(shaken), in_psnr(still))
    # dense GT knots live on the dense_grid: (F-1)*k + ceil(k) + 2*pad + 1
    assert shaken.knots.shape[0] == (3 - 1) * 3 + 3 + 4 + 1
