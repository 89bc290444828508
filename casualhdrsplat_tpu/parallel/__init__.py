from casualhdrsplat_tpu.parallel import mesh, render, sharding  # noqa: F401
