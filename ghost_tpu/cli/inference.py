"""Reference-compatible swap CLI.

Flag-for-flag parity with reference inference.py:127-151
(--G_path/--backbone/--num_blocks/--batch_size/--crop_size/--use_sr/
--similarity_th/--source_paths/--target_faces_paths/--target_video/
--out_video_name/--image_to_image/--target_image/--out_image_name),
plus TPU-native extras (--arcface_path, --detector_path,
--landmark_path, --bf16).

Usage:
    python -m ghost_tpu.cli.inference --source_paths a.jpg \
        --target_video in.mp4 --out_video_name out.mp4
"""

from __future__ import annotations

import argparse

from ghost_tpu.cli import str2bool
import os
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="ghost-tpu face swap")
    p.add_argument("--G_path", default="weights/G_unet_2blocks.pth")
    p.add_argument("--backbone", default="unet", const="unet", nargs="?",
                   choices=["unet", "linknet", "resnet"])
    p.add_argument("--num_blocks", default=2, type=int)
    p.add_argument("--batch_size", default=40, type=int)
    p.add_argument("--crop_size", default=224, type=int)
    # --use_sr / --image_to_image keep the reference's `type=bool` wart
    # for flag parity (reference inference.py:102,107: any non-empty
    # string, including "False", parses as True); the TPU-native flags
    # below use str2bool instead. The warning in help= is deliberate.
    p.add_argument("--use_sr", default=False, type=bool,
                   help="reference-parity flag: ANY non-empty value "
                        "(even 'False') enables; omit to disable")
    p.add_argument("--similarity_th", default=0.15, type=float)
    p.add_argument("--source_paths", default=[], nargs="+")
    p.add_argument("--target_faces_paths", default=[], nargs="+")
    p.add_argument("--target_video", default="", type=str)
    p.add_argument("--out_video_name", default="result.mp4", type=str)
    p.add_argument("--image_to_image", default=False, type=bool,
                   help="reference-parity flag: ANY non-empty value "
                        "(even 'False') enables; omit to disable")
    p.add_argument("--target_image", default="", type=str)
    p.add_argument("--out_image_name", default="result.png", type=str)
    # TPU-native extras
    p.add_argument("--streaming", default=True, type=str2bool,
                   help="constant-memory decode->swap->encode streaming")
    p.add_argument("--smooth", default=True, type=str2bool,
                   help="temporal keypoint smoothing (reference parity). "
                        "Off = fused single-program detect->swap per "
                        "chunk (fastest; stills are always fused)")
    p.add_argument("--arcface_path", default="weights/backbone.pth")
    p.add_argument("--detector_path", default="", help="SCRFD weights (msgpack)")
    p.add_argument("--landmark_path", default="", help="landmark weights (msgpack)")
    p.add_argument("--sr_path", default="", help="SR generator weights")
    p.add_argument("--sr_model", default="lipspade",
                   choices=["lipspade", "srvgg_student"],
                   help="--use_sr seat: lipspade = the reference's SR "
                        "generator on every swapped crop (roofline-"
                        "walled at ~65 fps T=2, BENCH_EXTRA_r04.json); "
                        "srvgg_student = a distilled SRVGG student "
                        "(cli/distill_enhancer output; 98.6 fps T=2 "
                        "all-lanes-present, BENCH_EXTRA_r05.json). "
                        "Student hyperparams are inferred from the "
                        "--sr_path checkpoint shapes; without --sr_path "
                        "the bundled round-5 weights are used "
                        "(assets/srvgg_student_x2_r05.msgpack)")
    p.add_argument("--bf16", default=True, type=str2bool)
    p.add_argument("--allow_random_weights", default=False, type=str2bool,
                   help="run without checkpoints (smoke tests / demos)")
    p.add_argument("--width", default=1.0, type=float,
                   help="AEI channel multiplier (1.0 = reference)")
    p.add_argument("--arcface_depth", default="iresnet100",
                   choices=["iresnet34", "iresnet50", "iresnet100", "tiny"])
    p.add_argument("--det_size", default=640, type=int)
    p.add_argument("--enhance_output", default="none",
                   choices=["none", "face", "full"],
                   help="post-enhance outputs: 'face' = GFPGAN restore "
                        "on detected faces, 'full' = + Real-ESRGAN "
                        "background (reference upsample(), "
                        "utils/training/upsampler.py:92-106)")
    p.add_argument("--gfpgan_path", default="",
                   help="GFPGANv1Clean weights (.pth)")
    p.add_argument("--bg_upsampler_path", default="",
                   help="background upsampler weights (.pth)")
    p.add_argument("--bg_model", default="rrdb", choices=["rrdb", "srvgg"],
                   help="background upsampler family: rrdb = "
                        "RealESRGAN_x4plus (the reference's "
                        "get_bg_upsampler), srvgg = realesr-general-x4v3 "
                        "(the fast model its Dockerfile also ships) — "
                        "~40x fewer FLOPs/pixel")
    return p


def bundled_student_ckpt() -> str | None:
    """Path of the shipped round-5 seat-student weights
    (assets/srvgg_student_x2_r05.msgpack, trained by
    scripts/train_student_seat_r05.py on the video-crop corpus;
    held-out metrics in docs/student_seat_r05.json), or None when
    running from an installation without the repo assets tree."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        "assets", "srvgg_student_x2_r05.msgpack")
    return path if os.path.exists(path) else None


def build_enhancer(args, pipe):
    """Optional GFPGAN/RRDB post-pass sharing the pipeline's detector."""
    if args.enhance_output == "none":
        return None
    import jax
    import jax.numpy as jnp

    from ghost_tpu.convert.torch_loader import (
        convert_gfpgan_state_dict,
        convert_rrdbnet_state_dict,
        load_torch_checkpoint,
    )
    from ghost_tpu.core.precision import DEFAULT_POLICY, FULL_PRECISION
    from ghost_tpu.models.sr.gfpgan import GFPGANClean
    from ghost_tpu.models.sr.rrdb import RRDBNet
    from ghost_tpu.pipeline.enhance import FaceEnhancer

    policy = DEFAULT_POLICY if args.bf16 else FULL_PRECISION
    gfp = GFPGANClean(policy=policy)
    if os.path.exists(args.gfpgan_path):
        gfp_vars = jax.tree.map(jnp.asarray, convert_gfpgan_state_dict(
            load_torch_checkpoint(args.gfpgan_path)))
    elif args.allow_random_weights:
        print("WARNING: random GFPGAN weights (--gfpgan_path not given)")
        gfp_vars = gfp.init(jax.random.key(0), jnp.zeros((1, 512, 512, 3)))
    else:
        raise SystemExit(f"missing --gfpgan_path {args.gfpgan_path!r}")
    bg = None
    if args.enhance_output == "full":
        if args.bg_model == "srvgg":
            from ghost_tpu.convert.torch_loader import \
                convert_srvgg_state_dict as convert_bg
            from ghost_tpu.models.sr.srvgg import SRVGGNetCompact
            bg_mod = SRVGGNetCompact(policy=policy)
        else:
            convert_bg = convert_rrdbnet_state_dict
            bg_mod = RRDBNet(policy=policy)
        if os.path.exists(args.bg_upsampler_path):
            bg_vars = jax.tree.map(jnp.asarray, convert_bg(
                load_torch_checkpoint(args.bg_upsampler_path)))
        elif args.allow_random_weights:
            print(f"WARNING: random {args.bg_model} weights "
                  "(--bg_upsampler_path not given)")
            bg_vars = bg_mod.init(jax.random.key(0),
                                  jnp.zeros((1, 32, 32, 3)))
        else:
            raise SystemExit(
                f"missing --bg_upsampler_path {args.bg_upsampler_path!r}")
        bg = (bg_mod, bg_vars)
    return FaceEnhancer((pipe.det_mod, pipe.det_vars),
                        (gfp, gfp_vars), bg, det_size=args.det_size)


def load_pipeline(args):
    import jax
    import jax.numpy as jnp

    from ghost_tpu.core.precision import DEFAULT_POLICY, FULL_PRECISION
    from ghost_tpu.convert.torch_loader import (
        convert_aei_state_dict,
        convert_arcface_state_dict,
        load_torch_checkpoint,
    )
    from ghost_tpu.core.checkpoint import load_msgpack
    from ghost_tpu.models.aei import AEINet
    from ghost_tpu.models.arcface import IResNet, _DEPTHS
    from ghost_tpu.models.landmark import Landmark106
    from ghost_tpu.models.scrfd import SCRFD
    from ghost_tpu.pipeline.swap import SwapConfig, SwapPipeline

    policy = DEFAULT_POLICY if args.bf16 else FULL_PRECISION
    import os

    cfg = SwapConfig(
        crop_size=args.crop_size,
        similarity_th=args.similarity_th,
        chunk_size=args.batch_size,
        use_sr=bool(args.use_sr),
        det_size=args.det_size,
    )

    gen = AEINet(backbone=args.backbone, num_blocks=args.num_blocks,
                 policy=policy, width=args.width,
                 fused_aad=jax.default_backend() == "tpu")
    if os.path.exists(args.G_path):
        gen_vars = jax.tree.map(
            jnp.asarray,
            convert_aei_state_dict(load_torch_checkpoint(args.G_path),
                                   backbone=args.backbone,
                                   num_blocks=args.num_blocks),
        )
    elif args.allow_random_weights:
        print("WARNING: random generator weights")
        gen_vars = gen.init(jax.random.key(0),
                            jnp.zeros((1, cfg.gen_size, cfg.gen_size, 3)),
                            jnp.zeros((1, 512)))
    else:
        raise SystemExit(f"missing --G_path {args.G_path!r} "
                         "(pass --allow_random_weights 1 for a smoke run)")

    arc_layers = (1, 1, 1, 1) if args.arcface_depth == "tiny" \
        else _DEPTHS[args.arcface_depth]
    arc = IResNet(layers=arc_layers, policy=policy)
    if args.arcface_path.endswith(".onnx"):
        # insightface recognition pack (glintr100.onnx), executed
        # natively via the ONNX executor; weights ride as jit args
        from ghost_tpu.models.arcface_onnx import ArcFaceOnnx

        arc = ArcFaceOnnx(args.arcface_path)
        arc_vars = jax.tree.map(jnp.asarray, arc.variables)
    elif os.path.exists(args.arcface_path) and args.arcface_depth != "tiny":
        arc_vars = jax.tree.map(
            jnp.asarray,
            convert_arcface_state_dict(load_torch_checkpoint(args.arcface_path),
                                       layers=arc_layers),
        )
    elif args.allow_random_weights:
        print("WARNING: random ArcFace weights")
        arc_vars = arc.init(jax.random.key(0), jnp.zeros((1, 112, 112, 3)))
    else:
        raise SystemExit(f"missing --arcface_path {args.arcface_path!r}")
    if args.detector_path.endswith(".onnx"):
        # the reference's own detector pack (scrfd_10g_bnkps.onnx),
        # executed natively on TPU via the ONNX executor
        from ghost_tpu.models.scrfd_onnx import SCRFDOnnx

        det = SCRFDOnnx(args.detector_path, input_size=cfg.det_size)
        det_vars = {}
        if not det.has_kps:
            print("WARNING: detector has no kps branch; alignment needs "
                  "a *_bnkps model")
    elif args.detector_path.endswith(".pth"):
        # mmdet SCRFD checkpoint (e.g. SCRFD-2.5GF model_25GF.pth);
        # boxes only — no kps branch in that family of checkpoints
        from ghost_tpu.convert.torch_loader import (convert_scrfd_state_dict,
                                                    load_torch_checkpoint)
        from ghost_tpu.models.scrfd_v1e import SCRFDV1e

        det = SCRFDV1e(policy=policy)
        det_vars = jax.tree.map(jnp.asarray, convert_scrfd_state_dict(
            load_torch_checkpoint(args.detector_path)))
        print("WARNING: SCRFD-2.5GF has no kps branch; alignment keypoints "
              "will be degenerate (detection/boxes only)")
    else:
        det = SCRFD(policy=policy)
        if args.detector_path:
            det_vars = load_msgpack(args.detector_path)
        else:
            det_vars = det.init(jax.random.key(0),
                                jnp.zeros((1, cfg.det_size, cfg.det_size, 3)))
            print("WARNING: random detector weights "
                  "(--detector_path not given)")
    lmk = Landmark106(policy=policy)
    if args.landmark_path:
        lmk_vars = load_msgpack(args.landmark_path)
    else:
        lmk_vars = lmk.init(jax.random.key(0), jnp.zeros((1, 192, 192, 3)))
        print("WARNING: random landmark weights (--landmark_path not given)")

    sr = None
    if cfg.use_sr:
        if args.sr_model == "srvgg_student":
            from ghost_tpu.models.sr.srvgg import (
                SRVGGNetCompact,
                SRVGGStudentSeat,
                srvgg_from_variables,
            )

            sr_path = args.sr_path or bundled_student_ckpt()
            if sr_path:
                if not args.sr_path:
                    print(f"using bundled seat student: {sr_path}")
                sr_vars = load_msgpack(sr_path)
                student = srvgg_from_variables(sr_vars, policy=policy)
            else:
                student = SRVGGNetCompact(num_feat=32, num_conv=16,
                                          upscale=2, policy=policy)
                sr_vars = student.init(
                    jax.random.key(0), jnp.zeros((1, 128, 128, 3)))
                print("WARNING: random SR-student weights "
                      "(--sr_path not given, no bundled checkpoint)")
            sr = (SRVGGStudentSeat(student), sr_vars)
        else:
            from ghost_tpu.models.sr.generator import LIPSPADEGenerator

            sr_mod = LIPSPADEGenerator(policy=policy)
            if args.sr_path:
                sr_vars = load_msgpack(args.sr_path)
            else:
                sr_vars = sr_mod.init(jax.random.key(0),
                                      jnp.zeros((1, 256, 256, 3)))
                print("WARNING: random SR weights (--sr_path not given)")
            sr = (sr_mod, sr_vars)

    return SwapPipeline((det, det_vars), (arc, arc_vars), (gen, gen_vars),
                        (lmk, lmk_vars), sr=sr, config=cfg)


def main(argv=None):
    from ghost_tpu.pipeline.image import read_image_rgb, write_image_rgb
    from ghost_tpu.pipeline.video import add_audio_from_video, read_video, write_video
    from ghost_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    args = build_parser().parse_args(argv)
    pipe = load_pipeline(args)
    enh = build_enhancer(args, pipe)
    post = enh.enhance if enh is not None else (lambda fr: fr)

    def crop_or_center(path: str) -> np.ndarray:
        img = read_image_rgb(path)
        crops, _scores = pipe.crop_faces(img)
        if crops.shape[0]:
            return crops[0]
        # reference exits on "Bad source images!" (inference.py:66-68);
        # with random detector weights fall back to a center crop so
        # smoke runs stay usable
        print(f"WARNING: no face found in {path}; using center crop")
        h, w = img.shape[:2]
        side = min(h, w)
        y0, x0 = (h - side) // 2, (w - side) // 2
        import cv2

        sq = img[y0:y0 + side, x0:x0 + side]
        return cv2.resize(sq, (pipe.cfg.crop_size, pipe.cfg.crop_size))

    print("List of source paths:", args.source_paths)
    sources = np.stack([crop_or_center(p) for p in args.source_paths])
    targets = None
    if args.target_faces_paths:
        targets = np.stack([crop_or_center(p) for p in args.target_faces_paths])

    start = time.time()
    if args.image_to_image:
        frame = read_image_rgb(args.target_image)
        # one device program (bit-exact vs the two-stage path)
        result = pipe.swap_image_fused(frame, sources, targets)
        result = post(result[None])[0]
        write_image_rgb(args.out_image_name, result)
        print(f"Swapped Image saved with path {args.out_image_name}")
    elif args.streaming:
        # constant-memory path: decode-thread ring -> stage A/B with
        # async overlap -> incremental encode (replaces the reference's
        # whole-video-in-RAM read_video, video_processing.py:37-66)
        from ghost_tpu.data.frames import stream_video_chunks
        from ghost_tpu.pipeline.video import VideoChunkWriter, video_fps

        writer = VideoChunkWriter(args.out_video_name,
                                  video_fps(args.target_video))
        n_out = 0
        for out in pipe.swap_video_stream(
                stream_video_chunks(args.target_video, pipe.cfg.chunk_size),
                sources, targets, smooth=args.smooth):
            writer.write(post(out))
            n_out += out.shape[0]
        writer.close()
        if n_out == 0:
            raise SystemExit(f"no frames decoded from {args.target_video}")
        if add_audio_from_video(args.target_video, args.out_video_name):
            print("audio remuxed")
        print(f"Video saved with path {args.out_video_name} ({n_out} frames)")
    else:
        frames, fps = read_video(args.target_video)
        out = pipe.swap_video_frames(frames, sources, targets,
                                     smooth=args.smooth)
        out = np.concatenate(
            [post(out[i:i + pipe.cfg.chunk_size])
             for i in range(0, out.shape[0], pipe.cfg.chunk_size)]) \
            if enh is not None else out
        write_video(args.out_video_name, out, fps)
        if add_audio_from_video(args.target_video, args.out_video_name):
            print("audio remuxed")
        print(f"Video saved with path {args.out_video_name}")
    print("Total time: ", time.time() - start)


if __name__ == "__main__":
    main()
