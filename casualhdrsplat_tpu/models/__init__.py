from casualhdrsplat_tpu.models import (  # noqa: F401
    crf,
    gaussians,
    image_formation,
    losses,
)
