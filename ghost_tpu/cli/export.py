"""Model export CLI — the TPU-native counterpart of export-onnx.py.

The reference exports AEI_Net and ArcFace to ONNX with dynamic batch
(reference export-onnx.py:44-77). Two formats:

  * --format stablehlo (default): jax.export's StableHLO artifact —
    hardware-agnostic, reloadable via jax.export.deserialize, callable
    from any XLA-backed runtime (including TF/TFLite via the StableHLO
    bridge). Weights ship alongside as a flax msgpack tree.
  * --format onnx: a real .onnx file (convert/onnx_emit.py, no onnx
    package needed) with dynamic batch — loads in onnxruntime-based
    consumers exactly like the reference's export; round-trip parity
    through our own executor is tested (tests/test_onnx_export.py).

Usage:
    python -m ghost_tpu.cli.export --model aei --out aei.onnx \
        --format onnx [--G_path weights/G_unet_2blocks.pth] [--batch -1]
"""

from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser(description="ghost-tpu model export")
    p.add_argument("--model", default="aei", choices=["aei", "arcface"])
    p.add_argument("--out", required=True,
                   help="output .stablehlo / .onnx path")
    p.add_argument("--format", default="stablehlo",
                   choices=["stablehlo", "onnx"])
    p.add_argument("--weights_out", default="", help="optional msgpack weights path")
    p.add_argument("--G_path", default="")
    p.add_argument("--arcface_path", default="")
    p.add_argument("--backbone", default="unet")
    p.add_argument("--num_blocks", default=2, type=int)
    p.add_argument("--width", default=1.0, type=float,
                   help="AEI channel-width multiplier (1.0 = reference)")
    p.add_argument("--arcface_depth", default="iresnet100")
    p.add_argument("--batch", default=-1, type=int,
                   help="-1 for symbolic (dynamic) batch")
    return p


def export_model(model_name: str, variables, batch: int = -1,
                 backbone: str = "unet", num_blocks: int = 2):
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from ghost_tpu.core.precision import DEFAULT_POLICY
    from ghost_tpu.models.aei import AEINet
    from ghost_tpu.models.arcface import iresnet100

    if model_name == "aei":
        mod = AEINet(backbone=backbone, num_blocks=num_blocks,
                     policy=DEFAULT_POLICY)

        def fn(xt, z_id):
            return mod.apply(variables, xt, z_id)[0]

        if batch == -1:
            b = jexport.symbolic_shape("b")[0]
        else:
            b = batch
        args = (
            jax.ShapeDtypeStruct((b, 256, 256, 3), jnp.float32),
            jax.ShapeDtypeStruct((b, 512), jnp.float32),
        )
    elif model_name == "arcface":
        mod = iresnet100(policy=DEFAULT_POLICY)

        def fn(x):
            return mod.apply(variables, x)

        if batch == -1:
            b = jexport.symbolic_shape("b")[0]
        else:
            b = batch
        args = (jax.ShapeDtypeStruct((b, 112, 112, 3), jnp.float32),)
    else:
        raise ValueError(model_name)

    exported = jexport.export(jax.jit(fn))(*args)
    return exported.serialize()


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ghost_tpu.core.checkpoint import save_msgpack
    from ghost_tpu.core.precision import DEFAULT_POLICY
    from ghost_tpu.models.aei import AEINet
    from ghost_tpu.models.arcface import _DEPTHS, IResNet

    args = build_parser().parse_args(argv)
    key = jax.random.key(0)
    arc_layers = _DEPTHS.get(args.arcface_depth, _DEPTHS["iresnet100"])
    if args.model == "aei":
        mod = AEINet(backbone=args.backbone, num_blocks=args.num_blocks,
                     width=args.width, policy=DEFAULT_POLICY)
        if args.G_path:
            from ghost_tpu.convert.torch_loader import (
                convert_aei_state_dict, load_torch_checkpoint)

            variables = jax.tree.map(jnp.asarray, convert_aei_state_dict(
                load_torch_checkpoint(args.G_path), args.backbone,
                args.num_blocks))
        else:
            variables = mod.init(key, jnp.zeros((1, 256, 256, 3)),
                                 jnp.zeros((1, 512)))
    else:
        mod = IResNet(layers=arc_layers, policy=DEFAULT_POLICY)
        if args.arcface_path:
            from ghost_tpu.convert.torch_loader import (
                convert_arcface_state_dict, load_torch_checkpoint)

            variables = jax.tree.map(jnp.asarray, convert_arcface_state_dict(
                load_torch_checkpoint(args.arcface_path)))
        else:
            variables = mod.init(key, jnp.zeros((1, 112, 112, 3)))

    if args.format == "onnx":
        from ghost_tpu.convert.onnx_emit import emit_aei, emit_arcface

        np_vars = jax.tree.map(np.asarray, variables)
        batch = "b" if args.batch == -1 else args.batch
        if args.model == "aei":
            blob = emit_aei(np_vars, backbone=args.backbone,
                            num_blocks=args.num_blocks, batch=batch)
        else:
            blob = emit_arcface(np_vars, layers=arc_layers, batch=batch)
    else:
        blob = export_model(args.model, variables, args.batch,
                            args.backbone, args.num_blocks)
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported {args.model} -> {args.out} ({len(blob)} bytes)")
    if args.weights_out:
        save_msgpack(args.weights_out, variables)
        print(f"weights -> {args.weights_out}")


if __name__ == "__main__":
    main()
