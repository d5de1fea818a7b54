"""facekit — a TPU-native face recognition framework (JAX/XLA/Pallas).

A ground-up rebuild of the capabilities of the C++/TensorRT reference system
``nghiapq77/face-recognition-cpp-tensorrt`` (see SURVEY.md): RetinaFace
MobileNetV1x0.25 detection (FPN + SSH heads, anchor decode, NMS), ArcFace
IR-50 512-d embeddings, cosine-similarity identification against an
HBM-resident gallery, SQLite persistence, and the reference's REST/WebSocket
API — all as XLA-compiled programs designed for TPU (static shapes, batched
MXU matmuls, Pallas kernels for the fused gallery search, jax.sharding for
multi-chip galleries).
"""

__version__ = "0.1.0"

from facekit.config import FaceKitConfig, load_config  # noqa: F401
