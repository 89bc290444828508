from casualhdrsplat_tpu.utils import runtime  # noqa: F401
