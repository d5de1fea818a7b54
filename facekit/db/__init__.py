from facekit.db.database import Database  # noqa: F401
