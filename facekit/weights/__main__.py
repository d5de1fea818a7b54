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
    ap.add_argument("model", choices=["arcface", "retinaface", "slim",
                                      "rfb", "train-checkpoint"])
    ap.add_argument("checkpoint",
                    help="torch .pth, or an orbax train-checkpoint dir "
                         "for train-checkpoint mode")
    ap.add_argument("output")
    ap.add_argument("--network", default="ir_50",
                    help="arcface variant (ir_50/ir_101/ir_152/ir_se_50/...)")
    ap.add_argument("--num-classes", type=int, default=None,
                    help="(train-checkpoint) classes the head was trained "
                         "with, needed to shape the restore template")
    ap.add_argument("--verify", action="store_true",
                    help="run the converted JAX model on random input and "
                         "report output stats (shape/finite/L2-norm)")
    ap.add_argument("--no-strict", action="store_true",
                    help="allow unconsumed checkpoint keys (by default the "
                         "converter refuses silent partial loads, like the "
                         "reference's check_keys)")
    args = ap.parse_args(argv)
    strict = not args.no_strict

    if args.model == "train-checkpoint":
        # facekit-trained backbone -> serving pytree (the train->serve
        # bridge; the reference's analog is its whole torch2trt step)
        import jax

        from facekit.train import train_state_init
        from facekit.train.checkpoint import restore_checkpoint

        if not args.num_classes:
            ap.error("train-checkpoint requires --num-classes")
        template = train_state_init(jax.random.PRNGKey(0),
                                    args.num_classes,
                                    network=args.network)
        state = restore_checkpoint(args.checkpoint, template)
        params = jax.device_get(state.params)
    else:
        sd = load_torch_checkpoint(args.checkpoint)
        if args.model == "arcface":
            params = convert_arcface_state_dict(sd, args.network,
                                                strict=strict)
        elif args.model == "retinaface":
            params = convert_retinaface_state_dict(sd, strict=strict)
        else:
            params = convert_lightdet_state_dict(sd, args.model,
                                                 strict=strict)
    save_params(params, args.output)
    print(f"wrote {args.output}")

    if args.verify:
        import numpy as np
        import jax.numpy as jnp
        rng = np.random.default_rng(0)
        if args.model in ("arcface", "train-checkpoint"):
            from facekit.models import arcface_apply
            x = jnp.asarray(rng.normal(0, 1, (1, 112, 112, 3)),
                            jnp.float32)
            out = np.asarray(arcface_apply(params, x, network=args.network))
            print(f"verify: emb {out.shape} finite={np.isfinite(out).all()} "
                  f"norm={np.linalg.norm(out, axis=1)}")
        elif args.model == "retinaface":
            from facekit.models import retinaface_apply
            x = jnp.asarray(rng.normal(0, 1, (1, 288, 320, 3)), jnp.float32)
            outs = retinaface_apply(params, x)
            print("verify:", [tuple(np.asarray(o).shape) for o in outs],
                  "finite =", all(np.isfinite(np.asarray(o)).all()
                                  for o in outs))
        else:
            from facekit.models.lightdet import lightdet_apply
            x = jnp.asarray(rng.normal(0, 1, (1, 320, 320, 3)), jnp.float32)
            outs = lightdet_apply(params, x, variant=args.model)
            print("verify:", [tuple(np.asarray(o).shape) for o in outs],
                  "finite =", all(np.isfinite(np.asarray(o)).all()
                                  for o in outs))


if __name__ == "__main__":
    main()
