from facekit.weights.convert import (  # noqa: F401
    convert_arcface_state_dict,
    convert_retinaface_state_dict,
    load_torch_checkpoint,
)
from facekit.weights.io import save_params, load_params  # noqa: F401
