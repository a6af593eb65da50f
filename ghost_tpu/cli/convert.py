"""Weight conversion CLI: reference checkpoints -> ghost-tpu msgpack.

The reference fetches weights with download_models.sh and loads them
per-framework (torch / onnxruntime / MXNet). This tool converts any of
them once into the framework's native msgpack trees, so serving boxes
need neither torch nor onnx installed:

    python -m ghost_tpu.cli.convert --kind aei \
        --src weights/G_unet_2blocks.pth --out g.msgpack
    python -m ghost_tpu.cli.convert --kind arcface \
        --src weights/backbone.pth --out arcface.msgpack
    python -m ghost_tpu.cli.convert --kind scrfd \
        --src model_25GF.pth --out scrfd.msgpack
    python -m ghost_tpu.cli.convert --kind landmark_mxnet \
        --src 2d106det-0000.params --out lmk.msgpack
    python -m ghost_tpu.cli.convert --kind spade \
        --src weights/10_net_G.pth --out sr.msgpack

kinds: aei | arcface | discriminator | spade | scrfd | landmark_mxnet |
vgg19. ONNX models need no conversion — they execute directly through
ghost_tpu.convert.onnx_exec (see models/scrfd_onnx.py,
train/distill_native.py).
"""

from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser(description="ghost-tpu weight conversion")
    p.add_argument("--kind", required=True,
                   choices=["aei", "arcface", "discriminator", "spade",
                            "scrfd", "landmark_mxnet", "vgg19",
                            "gfpgan", "rrdb", "srvgg", "sam", "fan"])
    p.add_argument("--src", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--backbone", default="unet",
                   choices=["unet", "linknet", "resnet"])
    p.add_argument("--num_blocks", default=2, type=int)
    p.add_argument("--arcface_depth", default="iresnet100",
                   choices=["iresnet34", "iresnet50", "iresnet100"])
    p.add_argument("--num_D", default=3, type=int)
    p.add_argument("--n_layers", default=5, type=int)
    p.add_argument("--ngf", default=48, type=int)
    p.add_argument("--num_conv", default=32, type=int,
                   help="srvgg trunk convs (realesr-general-x4v3: 32)")
    p.add_argument("--rrdb_blocks", default=23, type=int)
    p.add_argument("--sam_preset", default="vit_h",
                   choices=["vit_b", "vit_l", "vit_h"])
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import numpy as np

    from ghost_tpu.core.checkpoint import save_msgpack

    if args.kind == "landmark_mxnet":
        from ghost_tpu.models.landmark_mxnet import convert_2d106det_params

        if args.src.endswith(".npz"):
            blob = dict(np.load(args.src))
        else:
            # the raw MXNet NDArray file from the reference's
            # coordinate_reg/model/2d106det pack — parsed natively, no
            # mxnet install needed (convert/mxnet_nd.py)
            from ghost_tpu.convert.mxnet_nd import load_ndarray_dict

            blob = load_ndarray_dict(args.src)
        tree = convert_2d106det_params(blob)
    else:
        from ghost_tpu.convert import torch_loader as tl

        sd = tl.load_torch_checkpoint(args.src)
        if args.kind == "aei":
            tree = tl.convert_aei_state_dict(sd, args.backbone,
                                             args.num_blocks)
        elif args.kind == "arcface":
            from ghost_tpu.models.arcface import _DEPTHS

            tree = tl.convert_arcface_state_dict(
                sd, layers=_DEPTHS[args.arcface_depth])
        elif args.kind == "discriminator":
            tree = tl.convert_discriminator_state_dict(
                sd, num_D=args.num_D, n_layers=args.n_layers)
        elif args.kind == "spade":
            tree = tl.convert_spade_generator_state_dict(sd, ngf=args.ngf)
        elif args.kind == "scrfd":
            tree = tl.convert_scrfd_state_dict(sd)
        elif args.kind == "vgg19":
            from ghost_tpu.models.sr.vgg import convert_vgg19_features

            tree = convert_vgg19_features(sd)
        elif args.kind == "gfpgan":
            tree = tl.convert_gfpgan_state_dict(sd)
        elif args.kind == "rrdb":
            tree = tl.convert_rrdbnet_state_dict(
                sd, num_block=args.rrdb_blocks)
        elif args.kind == "srvgg":
            tree = tl.convert_srvgg_state_dict(sd, num_conv=args.num_conv)
        elif args.kind == "sam":
            depth = {"vit_b": 12, "vit_l": 24, "vit_h": 32}[args.sam_preset]
            tree = tl.convert_sam_state_dict(sd, depth=depth)
        elif args.kind == "fan":
            tree = tl.convert_fan_awl_state_dict(sd)
        else:  # pragma: no cover
            raise SystemExit(args.kind)

    save_msgpack(args.out, tree)
    n = sum(np.asarray(x).size for x in _leaves(tree))
    print(f"wrote {args.out}: {n / 1e6:.1f}M params")


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
