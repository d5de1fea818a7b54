"""CLI: convert reference PyTorch checkpoints to facekit msgpack pytrees.

The facekit analog of the reference's offline conversion step
(``conversion/retina/torch2trt.py`` / ``conversion/arcface/torch2trt.py``):

    python -m facekit.weights arcface backbone_ir50_asia.pth arcface.msgpack
    python -m facekit.weights retinaface mobilenet0.25_Final.pth retina.msgpack
    python -m facekit.weights slim slim_Final.pth slim.msgpack
"""

import argparse

from facekit.weights.convert import (convert_arcface_state_dict,
                                     convert_lightdet_state_dict,
                                     convert_retinaface_state_dict,
                                     load_torch_checkpoint)
from facekit.weights.io import save_params


def main(argv=None):
    ap = argparse.ArgumentParser("facekit weight converter")
    ap.add_argument("model", choices=["arcface", "retinaface", "slim", "rfb"])
    ap.add_argument("checkpoint")
    ap.add_argument("output")
    ap.add_argument("--network", default="ir_50",
                    help="arcface variant (ir_50/ir_101/ir_152/ir_se_50/...)")
    args = ap.parse_args(argv)

    sd = load_torch_checkpoint(args.checkpoint)
    if args.model == "arcface":
        params = convert_arcface_state_dict(sd, args.network)
    elif args.model == "retinaface":
        params = convert_retinaface_state_dict(sd)
    else:
        params = convert_lightdet_state_dict(sd, args.model)
    save_params(params, args.output)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
