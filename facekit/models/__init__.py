from facekit.models.arcface import (  # noqa: F401
    arcface_act_amax,
    arcface_apply,
    arcface_init,
    ARCFACE_STAGE_UNITS,
    calibrate_arcface_int8,
    quantize_arcface_params,
)
from facekit.models.retinaface import (  # noqa: F401
    quantize_detector_params,
    retinaface_apply,
    retinaface_init,
)


def init_model_params(config, det_key=0, rec_key=1):
    """(det_params, rec_params) for a config: dispatches the detector
    family, random-inits, and loads weight pytrees when configured.
    Shared by the server wiring (src/app.cpp:52-57 analog) and the engine
    export CLI."""
    import jax
    from facekit.weights import load_params

    if config.det_network in ("slim", "rfb"):
        from facekit.models.lightdet import lightdet_init
        det = lightdet_init(jax.random.PRNGKey(det_key),
                            variant=config.det_network)
    else:
        det = retinaface_init(jax.random.PRNGKey(det_key),
                              with_landmarks=config.det_withLandmarks)
    if config.det_weights:
        det = load_params(det, config.det_weights)
    rec = arcface_init(jax.random.PRNGKey(rec_key),
                       network=config.rec_network)
    if config.rec_weights:
        rec = load_params(rec, config.rec_weights)
    return det, rec
