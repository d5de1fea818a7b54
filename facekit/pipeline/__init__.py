from facekit.pipeline.recognize import FacePipeline  # noqa: F401
