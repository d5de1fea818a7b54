from facekit.gallery.store import GalleryStore  # noqa: F401
