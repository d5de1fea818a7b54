from facekit.utils.metrics import LatencyTracker, StageTimer  # noqa: F401
from facekit.utils.profiling import profile_trace  # noqa: F401
