from casualhdrsplat_tpu.geometry import lie, spline, camera  # noqa: F401
