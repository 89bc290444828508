from casualhdrsplat_tpu.ops import sh, projection, oracle  # noqa: F401
