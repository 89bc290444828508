from casualhdrsplat_tpu.data import synthetic, colmap, dataset  # noqa: F401
