"""Training CLI: all reference training regimes behind one entry point.

Flag parity with the reference train scripts (reference train.py:554-616
and the train-self/-roundtrip/-discriminator/-upsampler/-mask variants),
selected via --mode:

  canonical    GHOST GAN losses (utils/training/losses.py:14-67)
  distill      inswapper teacher distillation (train.py) — needs
               onnxruntime + --teacher_onnx; falls back with an error
  self         self-distillation from a frozen AEI teacher (train-self.py)
  roundtrip    adds the round-trip loss (train-roundtrip.py)

Usage:
    python -m ghost_tpu.cli.train --dataset_path /data/celeba \
        --mode canonical --batch_size 8
"""

from __future__ import annotations

import argparse

from ghost_tpu.cli import str2bool


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="ghost-tpu training")
    # reference flags (train.py:554-616)
    p.add_argument("--dataset_path", required=True)
    p.add_argument("--G_path", default="", help="pretrained G (torch .pth or ckpt dir)")
    p.add_argument("--D_path", default="")
    p.add_argument("--teacher_path", default="", help="frozen AEI teacher for --mode self")
    p.add_argument("--teacher_onnx", default="", help="inswapper_128.onnx for --mode distill")
    p.add_argument("--arcface_path", default="weights/backbone.pth")
    p.add_argument("--batch_size", default=16, type=int)
    p.add_argument("--lr_G", default=4e-4, type=float)
    p.add_argument("--lr_D", default=4e-4, type=float)
    p.add_argument("--b1", default=0.0, type=float)
    p.add_argument("--b2", default=0.999, type=float)
    p.add_argument("--weight_decay", default=1e-4, type=float)
    p.add_argument("--max_epochs", default=2000, type=int)
    p.add_argument("--show_step", default=250, type=int)
    p.add_argument("--save_interval", default=2500, type=int)
    p.add_argument("--run_name", default="ghost", type=str)
    p.add_argument("--output_dir", default="./output", type=str)
    p.add_argument("--backbone", default="unet",
                   choices=["unet", "linknet", "resnet"])
    p.add_argument("--num_blocks", default=2, type=int)
    p.add_argument("--same_person", default=0.2, type=float,
                   help="probability of same-person pairs (1 - same_prob)")
    # the four flags below keep the reference's `type=bool` wart for
    # flag parity (reference train.py:554-603); see cli/inference.py
    p.add_argument("--same_identity", default=False, type=bool,
                   help="reference-parity flag: ANY non-empty value (even 'False') enables; omit to disable")
    p.add_argument("--vgg_dataset", default=False, type=bool,
                   help="per-identity folder layout (VGGFace2); reference-parity flag: ANY non-empty value (even 'False') enables; omit to disable")
    p.add_argument("--celeba", default=False, type=bool,
                   help="reference-parity flag: ANY non-empty value (even 'False') enables; omit to disable")
    p.add_argument("--eye_detector_loss", default=False, type=bool,
                   help="reference-parity flag: ANY non-empty value (even 'False') enables; omit to disable")
    p.add_argument("--pretrained", default=True, type=bool,
                   help="load --G_path/--D_path weights (reference "
                        "train.py:512-521); type=bool parity wart: "
                        "pass '' (empty) to disable")
    p.add_argument("--verbose_output", default=False, type=bool,
                   help="print the loss dashboard every iteration "
                        "(reference train.py:602 'More print() when "
                        "training'); parity wart: ANY non-empty value enables")
    p.add_argument("--diff_eq_same", default=False, type=bool,
                   help="accepted for flag parity; dead in the reference "
                        "fork too (train.py:574 parses it, :218/:391 "
                        "hardcode diff_person=ones)")
    p.add_argument("--save_epoch", default=1, type=int,
                   help="accepted for flag parity; dead in the reference "
                        "fork too (train.py:588 parses it, never read — "
                        "use --save_interval)")
    p.add_argument("--scheduler", default=False, type=str2bool,
                   help="StepLR on both optimizers (reference "
                        "train.py:473-508)")
    p.add_argument("--scheduler_step", default=5000, type=int)
    p.add_argument("--scheduler_gamma", default=0.2, type=float)
    # distill-regime switches (reference train.py:276-377,593-601)
    p.add_argument("--teacher_fine_tune", default=False, type=str2bool,
                   help="distill: optimize the teacher residual only, "
                        "x1000 (reference train.py:375-377)")
    p.add_argument("--teacher_inner_crop", default=False, type=str2bool,
                   help="distill: teacher residual on the central face "
                        "crop (reference train.py:277-291)")
    p.add_argument("--teacher_lower_signal", default=False, type=str2bool,
                   help="distill: fixed low teacher/id_hq/multi-round "
                        "multipliers (reference train.py:346-349)")
    p.add_argument("--without_teacher_loss", default=False, type=str2bool,
                   help="distill: drop teacher/id_hq/eyes terms "
                        "(reference train.py:340-344)")
    p.add_argument("--teacher_upsample", default=False, type=str2bool,
                   help="distill: enhance teacher outputs with the SR "
                        "upscaler before the residual (reference "
                        "train.py:228-229 via GFPGAN/RealESRGAN; "
                        "natively LIPSPADE --sr_path)")
    p.add_argument("--sr_path", default="",
                   help="LIPSPADE weights for --teacher_upsample "
                        "(converted 10_net_G.pth or msgpack; empty = "
                        "random, smoke only)")
    p.add_argument("--sr_ngf", default=48, type=int)
    # CelebA-mode filters (reference train.py:597-600, Dataset.py:169-283)
    p.add_argument("--fine_tune_filter", default=None, type=str)
    p.add_argument("--into_data_path", default=None, type=str)
    p.add_argument("--only_attractive", default=False, type=str2bool)
    p.add_argument("--normalize_training_images", default=False,
                   type=str2bool)
    p.add_argument("--fan_path", default="", help="FAN weights (msgpack)")
    p.add_argument("--fan_stacks", default=4, type=int,
                   help="FAN hourglass stacks (4 = reference WFLW_4HG)")
    p.add_argument("--weight_adv", default=1.0, type=float)
    p.add_argument("--weight_attr", default=10.0, type=float)
    p.add_argument("--weight_id", default=15.0, type=float)
    p.add_argument("--weight_rec", default=10.0, type=float)
    p.add_argument("--weight_eyes", default=0.0, type=float)
    p.add_argument("--mode", default="canonical",
                   choices=["canonical", "distill", "self", "roundtrip"])
    p.add_argument("--d_interval", default=10, type=int)
    p.add_argument("--num_workers", default=8, type=int)
    p.add_argument("--max_steps", default=None, type=int)
    p.add_argument("--max_steps_per_process", default=0, type=int,
                   help="split training into successive child processes "
                        "of at most N steps each, exact-resuming from "
                        "the run checkpoint between them (params + "
                        "optimizer moments + loss scale + iteration). "
                        "Mitigates unbounded per-process host-RAM "
                        "growth, e.g. the dev relay client's ~17 MB "
                        "leak per dispatched step; the reference's "
                        "snapshots (reference train.py:449-456) cannot "
                        "do this losslessly — they drop optimizer "
                        "state. 0 = off")
    p.add_argument("--bf16", default=True, type=str2bool)
    p.add_argument("--resume", default=True, type=str2bool,
                   help="auto-resume from the run_name checkpoint dir "
                        "when it holds a step (exact: full train state "
                        "incl. optimizer moments). --resume 0 starts "
                        "fresh; use a new --run_name to keep the old "
                        "snapshots (saves below the dir's latest step "
                        "are skipped by orbax)")
    p.add_argument("--width", default=1.0, type=float)
    p.add_argument("--arcface_depth", default="iresnet100",
                   choices=["iresnet34", "iresnet50", "iresnet100", "tiny"],
                   help="'tiny' is for smoke tests only")
    return p


# child exit status meaning "slice complete, more steps remain" —
# distinct from success (0) and from real failures
_SLICE_RC = 3


def _supervise(argv):
    """--max_steps_per_process driver: run training as a chain of child
    processes, each bounded to N steps and exact-resuming from the run
    checkpoint (train/loop.py save_on_stop + the --resume path). One
    CLI invocation therefore survives step counts whose per-process
    host-RAM growth would OOM a single process (the dev TPU relay
    client leaks ~17 MB/step; a 7000-step run was OOM-killed at 122 GB
    in one process)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, GHOST_TPU_TRAIN_WORKER="1")
    # propagate a parent-forced jax platform to workers: a test/driver
    # that forced CPU via jax.config (the only way that works under the
    # force-registered TPU relay plugin — JAX_PLATFORMS env is ignored
    # there) must not spawn children that silently grab the TPU. Read
    # the CONFIG value, never jax.default_backend(): default_backend()
    # would initialize (and on exclusive-access TPU hosts, hold) the
    # accelerator client in this long-lived supervisor process,
    # starving every worker of the device.
    if "jax" in sys.modules:
        plat = getattr(sys.modules["jax"].config, "jax_platforms", None)
        if plat:
            env["GHOST_TPU_PLATFORM"] = plat
    base_cmd = [sys.executable, "-m", "ghost_tpu.cli.train"] + list(argv)
    # no-progress backstop: the chain needs exactly
    # ceil(max_steps / max_steps_per_process) workers (+1 slack for a
    # resume landing mid-slice); more means a worker is not advancing
    # the checkpoint — fail loudly instead of spawning forever
    a = build_parser().parse_args(argv)
    max_workers = -(-a.max_steps // a.max_steps_per_process) + 1
    n = 0
    while True:
        n += 1
        if n > max_workers:
            sys.exit(f"train supervisor: worker #{n} exceeds the "
                     f"{max_workers}-process budget for max_steps="
                     f"{a.max_steps} — workers are not advancing the "
                     "run checkpoint; aborting")
        # workers after the first MUST resume the slice checkpoint even
        # under --resume 0 (which only means "start the RUN fresh"):
        # otherwise each worker would retrain steps 0..cap and re-exit
        # _SLICE_RC forever. argparse last-occurrence-wins makes the
        # trailing override safe whatever the user passed.
        cmd = base_cmd if n == 1 else base_cmd + ["--resume", "1"]
        print(f"train supervisor: starting worker process #{n}",
              flush=True)
        rc = subprocess.call(cmd, env=env)
        if rc != _SLICE_RC:
            if rc != 0:
                sys.exit(rc)
            print(f"train supervisor: done after {n} worker processes",
                  flush=True)
            return


def main(argv=None):
    import os
    import sys

    from ghost_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    if os.environ.get("GHOST_TPU_PLATFORM"):
        import jax

        jax.config.update("jax_platforms",
                          os.environ["GHOST_TPU_PLATFORM"])
    args = build_parser().parse_args(argv)
    if args.max_steps_per_process and args.max_steps is None:
        # each worker process restarts its epoch iterator, so an
        # epoch-bound total would never terminate across slices
        raise SystemExit(
            "--max_steps_per_process requires --max_steps (the total)")
    if (args.max_steps_per_process
            and os.environ.get("GHOST_TPU_TRAIN_WORKER") != "1"):
        return _supervise(sys.argv[1:] if argv is None else list(argv))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ghost_tpu.core.checkpoint import CheckpointManager
    from ghost_tpu.core.precision import DEFAULT_POLICY, FULL_PRECISION
    from ghost_tpu.data.datasets import (
        CelebAStyleDataset,
        FaceEmbedDataset,
        FaceEmbedVGG2Dataset,
    )
    from ghost_tpu.data.loader import PrefetchLoader
    from ghost_tpu.models.aei import AEINet
    from ghost_tpu.models.arcface import IResNet, _DEPTHS
    from ghost_tpu.models.discriminator import MultiscaleDiscriminator
    from ghost_tpu.nn.layers import resize
    from ghost_tpu.train.loop import LoopConfig, train_loop
    from ghost_tpu.train.losses import GeneratorLossWeights
    from ghost_tpu.train.train_step import (
        TrainStepConfig,
        init_train_state,
        make_train_steps,
    )

    policy = DEFAULT_POLICY if args.bf16 else FULL_PRECISION
    key = jax.random.key(0)

    gen = AEINet(backbone=args.backbone, num_blocks=args.num_blocks,
                 policy=policy, train=True, width=args.width)
    if args.pretrained and args.G_path.endswith(".pth"):
        from ghost_tpu.convert.torch_loader import (
            convert_aei_state_dict, load_torch_checkpoint)

        g_vars = jax.tree.map(jnp.asarray, convert_aei_state_dict(
            load_torch_checkpoint(args.G_path), args.backbone,
            args.num_blocks))
    else:
        g_vars = gen.init(key, jnp.zeros((1, 256, 256, 3)),
                          jnp.zeros((1, 512)))

    disc = MultiscaleDiscriminator(n_layers=5, num_D=3, norm="instance",
                                   policy=policy)
    if args.pretrained and args.D_path.endswith(".pth"):
        from ghost_tpu.convert.torch_loader import (
            convert_discriminator_state_dict, load_torch_checkpoint)

        d_vars = jax.tree.map(jnp.asarray, convert_discriminator_state_dict(
            load_torch_checkpoint(args.D_path), num_D=3, n_layers=5))
    else:
        d_vars = disc.init(key, jnp.zeros((1, 256, 256, 3)))

    arc_layers = (1, 1, 1, 1) if args.arcface_depth == "tiny" \
        else _DEPTHS[args.arcface_depth]
    arc = IResNet(layers=arc_layers, policy=policy)
    if args.arcface_path and args.arcface_path.endswith(".pth") and \
            __import__("os").path.exists(args.arcface_path):
        from ghost_tpu.convert.torch_loader import (
            convert_arcface_state_dict, load_torch_checkpoint)

        a_vars = jax.tree.map(jnp.asarray, convert_arcface_state_dict(
            load_torch_checkpoint(args.arcface_path)))
    else:
        print("WARNING: random ArcFace weights")
        a_vars = arc.init(key, jnp.zeros((1, 112, 112, 3)))
    arc_apply = lambda x: arc.apply(a_vars, x)

    mode = {"canonical": "canonical", "distill": "distill",
            "self": "self_distill", "roundtrip": "round_trip"}[args.mode]
    step_cfg = TrainStepConfig(
        lr_g=args.lr_G, lr_d=args.lr_D, b1=args.b1, b2=args.b2,
        weight_decay=args.weight_decay, d_interval=args.d_interval,
        mode=mode, eye_loss=args.eye_detector_loss,
        scheduler=args.scheduler, scheduler_step=args.scheduler_step,
        scheduler_gamma=args.scheduler_gamma,
        teacher_inner_crop=args.teacher_inner_crop,
        teacher_fine_tune=args.teacher_fine_tune,
        teacher_lower_signal=args.teacher_lower_signal,
        without_teacher_loss=args.without_teacher_loss,
    )
    weights = GeneratorLossWeights(
        adv=args.weight_adv, attr=args.weight_attr, id=args.weight_id,
        rec=args.weight_rec, eyes=args.weight_eyes,
    )

    teacher_apply = None
    if mode == "self_distill":
        t_vars = g_vars
        if args.teacher_path:
            from ghost_tpu.convert.torch_loader import (
                convert_aei_state_dict, load_torch_checkpoint)

            t_vars = jax.tree.map(jnp.asarray, convert_aei_state_dict(
                load_torch_checkpoint(args.teacher_path), args.backbone,
                args.num_blocks))
        t_gen = AEINet(backbone=args.backbone, num_blocks=args.num_blocks,
                       policy=policy, train=False, width=args.width)
        teacher_apply = lambda xt, z: t_gen.apply(t_vars, xt, z)[0]

    fan_apply = None
    if args.eye_detector_loss:
        # reference train.py:483-501: FAN(4, 98) eye detector (WFLW_4HG
        # weights via --fan_path msgpack; random = smoke mode)
        from ghost_tpu.models.fan import FAN

        fan = FAN(num_stacks=args.fan_stacks, policy=policy)
        if args.fan_path:
            from ghost_tpu.core.checkpoint import load_msgpack

            fan_vars = load_msgpack(args.fan_path)
        else:
            print("WARNING: random FAN weights (--fan_path not given)")
            fan_vars = fan.init(jax.random.key(1),
                                jnp.zeros((1, 256, 256, 3)))
        fan_apply = lambda x01: fan.apply(fan_vars, x01)[-1]

    g_step, d_step = make_train_steps(gen, disc, arc_apply, step_cfg, weights,
                                      teacher_apply=teacher_apply,
                                      fan_apply=fan_apply)
    state = init_train_state(g_vars, d_vars, step_cfg)

    if args.celeba:
        ds = CelebAStyleDataset(
            args.dataset_path, fine_tune_filter=args.fine_tune_filter,
            into_data_path=args.into_data_path,
            only_attractive=args.only_attractive,
            normalize_pm1=args.normalize_training_images)
    elif args.vgg_dataset:
        ds = FaceEmbedVGG2Dataset(args.dataset_path,
                                  same_prob=1 - args.same_person,
                                  same_identity=args.same_identity)
    else:
        ds = FaceEmbedDataset([args.dataset_path],
                              same_prob=1 - args.same_person)
    loader = PrefetchLoader(ds, args.batch_size, num_workers=args.num_workers)

    def with_embeds(batches):
        embed_fn = jax.jit(
            lambda x: arc_apply(resize(x, (112, 112), method="area"))
        )
        for b in batches:
            b["embed"] = np.asarray(embed_fn(jnp.asarray(b["xs_arcface"])))
            yield b

    teacher = None
    if mode == "distill":
        from ghost_tpu.train.distill import build_inswapper_teacher

        teacher = build_inswapper_teacher(args.teacher_onnx)
        if args.teacher_upsample:
            from ghost_tpu.models.sr.generator import LIPSPADEGenerator
            from ghost_tpu.train.distill import UpsampledTeacher
            from ghost_tpu.train.extra_trainers import sr_upscale_fn

            from ghost_tpu.train.extra_trainers import load_lipspade_vars

            sr = LIPSPADEGenerator(ngf=args.sr_ngf, policy=policy)
            sr_vars = load_lipspade_vars(
                sr, args.sr_path, args.sr_ngf,
                warn_context="--teacher_upsample")
            teacher = UpsampledTeacher(
                teacher, sr_upscale_fn(sr, sr_vars, jit=True))

    def batch_iter():
        # fresh iterator per epoch: a one-shot generator here would
        # silently end training after a single dataset pass
        it = with_embeds(iter(loader))
        if teacher is not None:
            from ghost_tpu.train.distill import TeacherPrefetcher

            it = iter(TeacherPrefetcher(teacher, it))
        return it

    ckpt = CheckpointManager(
        f"{args.run_name}_ckpt" if not args.run_name.startswith("/")
        else args.run_name
    )
    start_iteration = 0
    if ckpt.latest_step() is not None:
        if args.resume:
            # restart-after-preemption (or plain rerun): restore the
            # FULL train state (params + optimizer moments + loss
            # scale) and continue the iteration count — exact resume,
            # which the reference cannot do (it drops optimizer state,
            # reference train.py:449-456)
            start_iteration = ckpt.latest_step() + 1
            state = ckpt.restore(like=state)
            print(f"resuming from checkpoint step {start_iteration - 1}")
        else:
            print(f"WARNING: --resume 0 with existing checkpoints at "
                  f"step {ckpt.latest_step()}; starting fresh — saves "
                  f"at already-written steps will be skipped")
    # --max_steps_per_process worker: bound this process's slice and
    # save a resume checkpoint at the cap (see _supervise)
    slice_cap = None
    eff_max_steps = args.max_steps
    if args.max_steps_per_process:
        slice_cap = start_iteration + args.max_steps_per_process
        eff_max_steps = (slice_cap if args.max_steps is None
                         else min(args.max_steps, slice_cap))
    loop_cfg = LoopConfig(
        max_epochs=args.max_epochs, d_interval=args.d_interval,
        show_step=args.show_step, save_interval=args.save_interval,
        run_name=args.run_name, distill=(mode != "canonical"),
        output_dir=args.output_dir,
        print_interval=1 if args.verbose_output else 10,
        save_on_stop=slice_cap is not None,
    )
    from ghost_tpu.train.preempt import PreemptionGuard

    with PreemptionGuard() as guard:
        state, metrics = train_loop(state, g_step, d_step, batch_iter,
                                    loop_cfg, checkpoint_manager=ckpt,
                                    max_steps=eff_max_steps,
                                    preemption=guard,
                                    start_iteration=start_iteration)
    print("final:", metrics)
    if slice_cap is not None and not (guard.triggered if guard else False):
        end = ckpt.latest_step()
        # more work remains iff the slice ran to its cap and the cap is
        # below the requested total (epoch-bound runs that stopped
        # early — exhausted data / max_epochs — exit 0)
        if end is not None and end + 1 >= slice_cap and (
                args.max_steps is None or end + 1 < args.max_steps):
            sys.exit(_SLICE_RC)


if __name__ == "__main__":
    main()
