"""Checkpoint converter: native <-> reference torch .pth.tar.

  python tools/convert_checkpoint.py --to-torch  in.ckpt out.pth.tar --model infonce
  python tools/convert_checkpoint.py --from-torch in.pth.tar out.ckpt \
      --model coclr --net s3d [--moco-dim 128 --moco-k 2048]

Exported files load in the reference repo (strict state_dict match incl. the
duplicate S3D blockN.* aliases); imported files run in this stack.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--to-torch", action="store_true")
    p.add_argument("--from-torch", action="store_true")
    p.add_argument("--model", default="infonce",
                   choices=["infonce", "ubernce", "coclr"])
    p.add_argument("--net", default="s3d")
    p.add_argument("--moco-dim", default=128, type=int)
    p.add_argument("--moco-k", default=2048, type=int)
    p.add_argument("--seq_len", default=32, type=int)
    p.add_argument("--img_dim", default=128, type=int)
    p.add_argument("--ckpt_format", default="flax", choices=["flax", "orbax"],
                   help="native format written by --from-torch (reads "
                        "auto-detect either way)")
    args = p.parse_args()
    if args.to_torch == args.from_torch:
        raise SystemExit("pass exactly one of --to-torch / --from-torch")

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from coclr_tpu.models import moco
    from coclr_tpu.models.encoder import ProjectionEncoder
    from coclr_tpu.utils import torch_interop
    from coclr_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    encoder = ProjectionEncoder(network=args.net, dim=args.moco_dim,
                                dtype=jnp.float32)
    sample = jnp.zeros((1, args.seq_len, args.img_dim, args.img_dim, 3),
                       jnp.float32)
    template = moco.init_moco_state(jax.random.PRNGKey(0), encoder,
                                    args.model, sample, dim=args.moco_dim,
                                    K=args.moco_k)

    if args.to_torch:
        ckpt = load_checkpoint(args.src, state_template=template)
        sd = torch_interop.torch_from_moco_state(ckpt["state"], args.model)
        torch_interop.save_torch_checkpoint(
            args.dst, sd, epoch=ckpt.get("epoch", 0),
            best_acc=ckpt.get("best_acc", 0.0),
            iteration=ckpt.get("iteration", 0))
        print(f"wrote {args.dst} ({len(sd)} tensors)")
    else:
        ckpt = torch_interop.load_torch_checkpoint(args.src)
        state = torch_interop.moco_state_from_torch(
            ckpt["state_dict"], template, args.model)
        save_checkpoint({"epoch": ckpt.get("epoch", 0), "state": state,
                         "opt_state": {}, "best_acc": ckpt.get("best_acc", 0.0),
                         "iteration": ckpt.get("iteration", 0)},
                        filename=args.dst, fmt=args.ckpt_format)
        print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
