from facekit.parallel.mesh import make_mesh  # noqa: F401
from facekit.parallel.sharded_search import (  # noqa: F401
    shard_gallery,
    shard_rows,
    sharded_cosine_topk,
)
