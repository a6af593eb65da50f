"""Auxiliary trainer CLIs: D pretrain, upsampler-in-the-loop, mask.

One entry point for the reference's three standalone trainer scripts,
selected via --mode (step logic lives in train/extra_trainers.py):

  discriminator  reference train-discriminator.py:60-199 — D alone
                 learns real(Xs) vs fake(G output) with hinge loss,
                 heavily weighted (x1000 at :185). The reference's
                 "fake" source is the inswapper teacher; the native
                 default is a frozen G (--G_path), which is the same
                 regime once a distilled G exists.
  upsampler      reference train-upsampler.py:45-225 — G fine-tuned to
                 match an upscaled version of its own output
                 (upsample_loss MSE x30000 :110-135) plus the
                 multi-scale perceptual color loss (:91). The upscaler
                 is the native LIPSPADE SR generator (--sr_path for the
                 converted 10_net_G.pth; random weights smoke-test the
                 plumbing).
  mask           reference train-mask.py:236-324 — AEI-Net repurposed
                 to predict soft face masks, MSE x10000 against
                 precomputed targets (--mask_source dir from
                 cli/precompute_masks.py: hull or native-SAM masks,
                 paired by basename).

Usage:
    python -m ghost_tpu.cli.train_extras --mode discriminator \
        --dataset_path /data/crops --run_name d_pretrain
    python -m ghost_tpu.cli.train_extras --mode mask \
        --dataset_path /data/crops --mask_source /data/masks \
        --run_name masknet
"""

from __future__ import annotations

import argparse
import os

from ghost_tpu.cli import str2bool


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="ghost-tpu auxiliary trainers")
    p.add_argument("--mode", required=True,
                   choices=["discriminator", "upsampler", "mask"])
    # reference-shared flags (train-discriminator.py:283-311,
    # train-upsampler.py:337-358, train-mask.py:455-483)
    p.add_argument("--dataset_path", required=True,
                   help="aligned 256 crops (flat dir)")
    p.add_argument("--G_path", default="", help="pretrained G (torch .pth)")
    p.add_argument("--D_path", default="", help="pretrained D (torch .pth)")
    p.add_argument("--backbone", default="unet",
                   choices=["unet", "linknet", "resnet"])
    p.add_argument("--num_blocks", default=2, type=int)
    p.add_argument("--batch_size", default=16, type=int)
    p.add_argument("--lr", default=4e-4, type=float,
                   help="lr_D (discriminator) / lr_G (upsampler, mask)")
    p.add_argument("--max_epochs", default=2000, type=int)
    p.add_argument("--max_steps", default=None, type=int)
    p.add_argument("--show_step", default=100, type=int)
    p.add_argument("--save_interval", default=2500, type=int)
    p.add_argument("--run_name", default="ghost_extra", type=str)
    p.add_argument("--arcface_path", default="weights/backbone.pth")
    p.add_argument("--arcface_depth", default="iresnet100",
                   choices=["iresnet34", "iresnet50", "iresnet100", "tiny"],
                   help="'tiny' is for smoke tests only")
    p.add_argument("--bf16", default=True, type=str2bool)
    p.add_argument("--width", default=1.0, type=float)
    p.add_argument("--num_workers", default=4, type=int)
    # mode-specific knobs (reference loss multipliers)
    p.add_argument("--loss_mult", default=1000.0, type=float,
                   help="discriminator: hinge multiplier "
                        "(train-discriminator.py:185)")
    p.add_argument("--upsample_mult", default=30000.0, type=float,
                   help="upsampler: MSE multiplier "
                        "(train-upsampler.py:110-135)")
    p.add_argument("--mask_mult", default=10000.0, type=float,
                   help="mask: MSE multiplier (train-mask.py:300-308)")
    p.add_argument("--sr_path", default="",
                   help="upsampler: LIPSPADE weights (converted "
                        "10_net_G.pth .pth or msgpack); empty = random "
                        "(smoke only)")
    p.add_argument("--sr_ngf", default=48, type=int)
    p.add_argument("--mask_source", default="",
                   help="mask: dir of precomputed targets "
                        "(cli/precompute_masks.py output; basename-"
                        "paired .png/.npy)")
    return p


def _load_gen(args, policy, train: bool):
    import jax
    import jax.numpy as jnp

    from ghost_tpu.models.aei import AEINet

    gen = AEINet(backbone=args.backbone, num_blocks=args.num_blocks,
                 policy=policy, train=train, width=args.width)
    if args.G_path.endswith(".pth"):
        from ghost_tpu.convert.torch_loader import (
            convert_aei_state_dict, load_torch_checkpoint)

        g_vars = jax.tree.map(jnp.asarray, convert_aei_state_dict(
            load_torch_checkpoint(args.G_path), args.backbone,
            args.num_blocks))
    else:
        print("WARNING: random G weights (--G_path not given)")
        g_vars = gen.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)),
                          jnp.zeros((1, 512)))
    return gen, g_vars


def _load_arc(args, policy):
    import jax
    import jax.numpy as jnp

    from ghost_tpu.models.arcface import IResNet, _DEPTHS
    from ghost_tpu.nn.layers import resize

    arc_layers = (1, 1, 1, 1) if args.arcface_depth == "tiny" \
        else _DEPTHS[args.arcface_depth]
    arc = IResNet(layers=arc_layers, policy=policy)
    if args.arcface_path.endswith(".pth") and os.path.exists(
            args.arcface_path):
        from ghost_tpu.convert.torch_loader import (
            convert_arcface_state_dict, load_torch_checkpoint)

        a_vars = jax.tree.map(jnp.asarray, convert_arcface_state_dict(
            load_torch_checkpoint(args.arcface_path)))
    else:
        print("WARNING: random ArcFace weights")
        a_vars = arc.init(jax.random.key(0), jnp.zeros((1, 112, 112, 3)))
    # weights ride as jit ARGUMENTS, not closure-captured HLO constants
    # (the relay 413 rule — see SwapPipeline._vars)
    jfn = jax.jit(
        lambda v, x: arc.apply(v, resize(x, (112, 112), method="area")))
    return lambda x: jfn(a_vars, x)


def _epoch_batches(loader, embed_fn, max_epochs: int):
    import numpy as np

    for _ in range(max_epochs):
        empty = True
        for b in loader:
            if embed_fn is not None:
                b["embed"] = np.asarray(embed_fn(b["xs_arcface"]))
            empty = False
            yield b
        if empty:
            return


def main(argv=None):
    from ghost_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ghost_tpu.core.checkpoint import save_msgpack
    from ghost_tpu.core.precision import DEFAULT_POLICY, FULL_PRECISION
    from ghost_tpu.data.loader import PrefetchLoader

    policy = DEFAULT_POLICY if args.bf16 else FULL_PRECISION
    out_path = f"{args.run_name}_{args.mode}.msgpack"

    if args.mode == "discriminator":
        from ghost_tpu.models.discriminator import MultiscaleDiscriminator
        from ghost_tpu.train.extra_trainers import (
            make_discriminator_pretrain_step)

        gen, g_vars = _load_gen(args, policy, train=False)
        disc = MultiscaleDiscriminator(n_layers=5, num_D=3, norm="instance",
                                       policy=policy)
        if args.D_path.endswith(".pth"):
            from ghost_tpu.convert.torch_loader import (
                convert_discriminator_state_dict, load_torch_checkpoint)

            d_vars = jax.tree.map(
                jnp.asarray, convert_discriminator_state_dict(
                    load_torch_checkpoint(args.D_path), num_D=3, n_layers=5))
        else:
            d_vars = disc.init(jax.random.key(1),
                               jnp.zeros((1, 256, 256, 3)))
        arc_apply = _load_arc(args, policy)
        _fake = jax.jit(lambda v, xt, z: gen.apply(v, xt, z)[0])
        fake_fn = lambda xt, z: _fake(g_vars, xt, z)
        step, tx = make_discriminator_pretrain_step(
            disc, lr=args.lr, loss_mult=args.loss_mult)
        step = jax.jit(step)
        d_params, d_opt = d_vars["params"], tx.init(d_vars["params"])

        from ghost_tpu.data.datasets import FaceEmbedDataset

        ds = FaceEmbedDataset([args.dataset_path])
        loader = PrefetchLoader(ds, args.batch_size,
                                num_workers=args.num_workers)
        it = 0
        for b in _epoch_batches(loader, arc_apply, args.max_epochs):
            fake = fake_fn(jnp.asarray(b["xt"]), jnp.asarray(b["embed"]))
            d_params, d_opt, loss = step(d_params, d_opt, fake,
                                         jnp.asarray(b["xs"]))
            if it % args.show_step == 0:
                print(f"step {it} lossD {float(loss):.4f}")
            it += 1
            if it % args.save_interval == 0:
                save_msgpack(out_path, {"params": d_params})
            if args.max_steps is not None and it >= args.max_steps:
                break
        save_msgpack(out_path, {"params": d_params})

    elif args.mode == "upsampler":
        from ghost_tpu.models.sr.generator import LIPSPADEGenerator
        from ghost_tpu.train.extra_trainers import (
            load_lipspade_vars, make_upsampler_finetune_step,
            sr_upscale_apply)

        gen, g_vars = _load_gen(args, policy, train=True)
        sr = LIPSPADEGenerator(ngf=args.sr_ngf, policy=policy)
        sr_vars = load_lipspade_vars(sr, args.sr_path, args.sr_ngf,
                                     warn_context="--mode upsampler")
        arc_apply = _load_arc(args, policy)
        step, tx = make_upsampler_finetune_step(
            gen, sr_upscale_apply(sr), lr=args.lr,
            upsample_mult=args.upsample_mult)
        step = jax.jit(step)
        g_params, g_stats = g_vars["params"], g_vars["batch_stats"]
        g_opt = tx.init(g_params)

        from ghost_tpu.data.datasets import FaceEmbedDataset

        ds = FaceEmbedDataset([args.dataset_path])
        loader = PrefetchLoader(ds, args.batch_size,
                                num_workers=args.num_workers)
        it = 0
        for b in _epoch_batches(loader, arc_apply, args.max_epochs):
            g_params, g_stats, g_opt, metrics = step(
                g_params, g_stats, g_opt, sr_vars, jnp.asarray(b["xt"]),
                jnp.asarray(b["embed"]))
            if it % args.show_step == 0:
                print(f"step {it} loss {float(metrics['loss']):.4f} "
                      f"upsample {float(metrics['upsample']):.4f}")
            it += 1
            if it % args.save_interval == 0:
                save_msgpack(out_path, {"params": g_params,
                                        "batch_stats": g_stats})
            if args.max_steps is not None and it >= args.max_steps:
                break
        save_msgpack(out_path, {"params": g_params,
                                "batch_stats": g_stats})

    else:  # mask
        if not args.mask_source:
            raise SystemExit(
                "--mode mask needs --mask_source (precompute targets "
                "with: python -m ghost_tpu.cli.precompute_masks "
                "--input_dir crops/ --output_dir masks/ [--sam_path])")
        from ghost_tpu.data.datasets import MaskTargetDataset
        from ghost_tpu.train.extra_trainers import make_mask_train_step

        gen, g_vars = _load_gen(args, policy, train=True)
        arc_apply = _load_arc(args, policy)
        step, tx = make_mask_train_step(gen, lr=args.lr,
                                        mask_mult=args.mask_mult)
        step = jax.jit(step)
        g_params, g_stats = g_vars["params"], g_vars["batch_stats"]
        g_opt = tx.init(g_params)

        ds = MaskTargetDataset(args.dataset_path, args.mask_source)
        loader = PrefetchLoader(ds, args.batch_size,
                                num_workers=args.num_workers)
        it = 0
        for b in _epoch_batches(loader, arc_apply, args.max_epochs):
            g_params, g_stats, g_opt, loss = step(
                g_params, g_stats, g_opt, jnp.asarray(b["xt"]),
                jnp.asarray(b["embed"]), jnp.asarray(b["mask"]))
            if it % args.show_step == 0:
                print(f"step {it} mask loss {float(loss):.4f}")
            it += 1
            if it % args.save_interval == 0:
                save_msgpack(out_path, {"params": g_params,
                                        "batch_stats": g_stats})
            if args.max_steps is not None and it >= args.max_steps:
                break
        save_msgpack(out_path, {"params": g_params,
                                "batch_stats": g_stats})

    print(f"saved {out_path}")


if __name__ == "__main__":
    main()
