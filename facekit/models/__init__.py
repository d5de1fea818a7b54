from facekit.models.arcface import (  # noqa: F401
    arcface_apply,
    arcface_init,
    ARCFACE_STAGE_UNITS,
)
from facekit.models.retinaface import (  # noqa: F401
    retinaface_apply,
    retinaface_init,
)
