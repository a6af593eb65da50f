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
    p.add_argument("--allow_random_weights", default=False, type=str2bool,
                   help="permit random G/ArcFace init when a weight "
                        "path is ABSENT (smoke tests only); an "
                        "explicitly given path that does not exist "
                        "always errors")
    return p


_DEFAULT_ARC = "weights/backbone.pth"


def _require_random_ok(args, what: str):
    if not args.allow_random_weights:
        raise SystemExit(
            f"no {what} weights given — a full run on random {what} "
            f"produces a useless checkpoint; pass the weight path, or "
            f"--allow_random_weights 1 for smoke tests")
    print(f"WARNING: random {what} weights (smoke mode)")


def _load_gen(args, policy, train: bool):
    import jax
    import jax.numpy as jnp

    from ghost_tpu.models.aei import AEINet

    gen = AEINet(backbone=args.backbone, num_blocks=args.num_blocks,
                 policy=policy, train=train, width=args.width)
    if args.G_path:
        # torch .pth OR this framework's own .msgpack outputs (the
        # distilled-G regime the discriminator-mode docstring names);
        # a typo'd path errors instead of silently training on noise
        if not os.path.exists(args.G_path):
            raise SystemExit(f"--G_path {args.G_path!r} does not exist")
        if args.G_path.endswith(".pth"):
            from ghost_tpu.convert.torch_loader import (
                convert_aei_state_dict, load_torch_checkpoint)

            g_vars = jax.tree.map(jnp.asarray, convert_aei_state_dict(
                load_torch_checkpoint(args.G_path), args.backbone,
                args.num_blocks))
        else:
            from ghost_tpu.core.checkpoint import load_msgpack

            g_vars = load_msgpack(args.G_path)
            if "params" not in g_vars:
                raise SystemExit(
                    f"--G_path {args.G_path!r} has no 'params' tree")
        return gen, g_vars
    _require_random_ok(args, "G")
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
    if os.path.exists(args.arcface_path):
        if args.arcface_path.endswith(".pth"):
            from ghost_tpu.convert.torch_loader import (
                convert_arcface_state_dict, load_torch_checkpoint)

            a_vars = jax.tree.map(jnp.asarray, convert_arcface_state_dict(
                load_torch_checkpoint(args.arcface_path)))
        else:
            from ghost_tpu.core.checkpoint import load_msgpack

            a_vars = load_msgpack(args.arcface_path)
    else:
        if args.arcface_path != _DEFAULT_ARC:
            raise SystemExit(
                f"--arcface_path {args.arcface_path!r} does not exist")
        _require_random_ok(args, "ArcFace")
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


def _run_loop(args, out_path, batches, step_once, state, save_tree):
    """Shared trainer loop (the three modes differ only in their step
    call and saved tree): show_step prints, save_interval snapshots, a
    SIGTERM preemption latch (train/preempt.py — TPU VMs get SIGTERM
    ahead of maintenance/spot reclaims) that saves and stops cleanly,
    and a final save. step_once(state, batch) -> (state, printable)."""
    from ghost_tpu.core.checkpoint import save_msgpack
    from ghost_tpu.train.preempt import PreemptionGuard

    it = 0
    with PreemptionGuard() as guard:
        for b in batches:
            state, msg = step_once(state, b)
            if it % args.show_step == 0:
                print(f"step {it} {msg}")
            it += 1
            if it % args.save_interval == 0:
                save_msgpack(out_path, save_tree(state))
            if guard.triggered:
                print("train_extras: preemption signal latched — "
                      "saving final state and stopping")
                break
            if args.max_steps is not None and it >= args.max_steps:
                break
    save_msgpack(out_path, save_tree(state))
    return state


def main(argv=None):
    from ghost_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

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

        def step_once(state, b):
            d_params, d_opt = state
            fake = fake_fn(jnp.asarray(b["xt"]), jnp.asarray(b["embed"]))
            d_params, d_opt, loss = step(d_params, d_opt, fake,
                                         jnp.asarray(b["xs"]))
            return (d_params, d_opt), f"lossD {float(loss):.4f}"

        _run_loop(args, out_path,
                  _epoch_batches(loader, arc_apply, args.max_epochs),
                  step_once, (d_params, d_opt),
                  lambda s: {"params": s[0]})

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

        def step_once(state, b):
            g_params, g_stats, g_opt = state
            g_params, g_stats, g_opt, metrics = step(
                g_params, g_stats, g_opt, sr_vars, jnp.asarray(b["xt"]),
                jnp.asarray(b["embed"]))
            return (g_params, g_stats, g_opt), (
                f"loss {float(metrics['loss']):.4f} "
                f"upsample {float(metrics['upsample']):.4f}")

        _run_loop(args, out_path,
                  _epoch_batches(loader, arc_apply, args.max_epochs),
                  step_once, (g_params, g_stats, g_opt),
                  lambda s: {"params": s[0], "batch_stats": s[1]})

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

        def step_once(state, b):
            g_params, g_stats, g_opt = state
            g_params, g_stats, g_opt, loss = step(
                g_params, g_stats, g_opt, jnp.asarray(b["xt"]),
                jnp.asarray(b["embed"]), jnp.asarray(b["mask"]))
            return (g_params, g_stats, g_opt), f"mask loss {float(loss):.4f}"

        _run_loop(args, out_path,
                  _epoch_batches(loader, arc_apply, args.max_epochs),
                  step_once, (g_params, g_stats, g_opt),
                  lambda s: {"params": s[0], "batch_stats": s[1]})

    print(f"saved {out_path}")


if __name__ == "__main__":
    main()
