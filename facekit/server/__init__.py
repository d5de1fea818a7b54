from facekit.server.app import FaceServer, make_app  # noqa: F401
