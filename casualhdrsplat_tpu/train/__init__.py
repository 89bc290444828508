from casualhdrsplat_tpu.train import optim, densify, checkpoint, trainer  # noqa: F401
