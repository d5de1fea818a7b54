from facekit.ops.resize import (  # noqa: F401
    resize_matrix,
    resize_image,
    letterbox,
    letterbox_geometry,
    crop_resize,
)
from facekit.ops.preprocess import (  # noqa: F401
    det_normalize,
    rec_normalize,
)
from facekit.ops.anchors import generate_anchors  # noqa: F401
from facekit.ops.boxes import (  # noqa: F401
    decode_boxes,
    decode_landmarks,
    unletterbox_boxes,
    iou_matrix,
    nms,
    select_faces,
)
from facekit.ops.align import (  # noqa: F401
    umeyama,
    warp_align,
    warp_align_gather,
    warp_align_shear,
)
from facekit.ops.similarity import (  # noqa: F401
    cosine_topk_int8,
    cosine_topk_pallas,
    cosine_topk_xla,
    quantize_rows_int8,
)
