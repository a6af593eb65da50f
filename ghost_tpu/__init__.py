"""ghost-tpu: a TPU-native one-shot face-swap framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of
postworthy/ghost (GHOST one-shot face swap + teacher-distillation fork).
All tensors are NHWC, RGB, float in [-1, 1] unless stated otherwise —
the TPU-native layout — and every compute path is jittable with static
shapes so XLA can tile it onto the MXU.

Layer map (mirrors SURVEY.md §7):
  core      pytree module conventions, precision policy, mesh/sharding,
            checkpointing, config
  nn        torch-parity primitive layers (conv4x4, deconv4x4, instance
            norm, resize-by-gather) used by all model families
  models    AEI-Net generator, ArcFace iresnet, SCRFD detector,
            106-pt landmarker, multiscale discriminator, SPADE SR stack
  ops       geometry + compositing: umeyama alignment, affine warp,
            soft face masks, paste-back blending (Pallas hot paths)
  parallel  mesh/data-parallel train-step wiring, cross-replica norms,
            ZeRO-style optimizer-state sharding
  train     losses (GHOST canonical + distillation fork), train steps
  data      dataset pairing logic, host->device frame pipelines
  pipeline  end-to-end image/video swap orchestration
  cli       reference-compatible command line entry points
"""

__version__ = "0.1.0"
