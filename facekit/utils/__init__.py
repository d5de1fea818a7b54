from facekit.utils.metrics import LatencyTracker, StageTimer  # noqa: F401
from facekit.utils.profiling import profile_trace  # noqa: F401


def tpu_default_backend() -> bool:
    """True when jax's default backend is a TPU (i.e. the Pallas TPU
    kernels are runnable). Shared by the gallery store and the engine
    export CLI so backend detection can never drift between them."""
    import jax
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
