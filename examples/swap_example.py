"""End-to-end example (the SberSwapInference.ipynb equivalent).

Runs the full pipeline on synthetic data with random weights so it works
anywhere; swap in converted checkpoints for real output (see README).

    python examples/swap_example.py
"""

import numpy as np

from ghost_tpu.core.precision import DEFAULT_POLICY
from ghost_tpu.pipeline.swap import SwapConfig, build_random_pipeline
from ghost_tpu.utils.profiling import StageTimer


def main():
    cfg = SwapConfig(chunk_size=8, max_faces=4)
    print("building pipeline (random weights)...")
    pipe = build_random_pipeline(cfg, policy=DEFAULT_POLICY,
                                 arcface_layers=(1, 1, 1, 1))

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (16, 480, 640, 3), dtype=np.uint8)
    source = rng.integers(0, 255, (1, 224, 224, 3), dtype=np.uint8)
    target = rng.integers(0, 255, (1, 224, 224, 3), dtype=np.uint8)

    timer = StageTimer()
    with timer.stage("video_swap", items=len(frames)):
        out = pipe.swap_video_frames(frames, source, target)
    print("output:", out.shape, out.dtype)
    print(timer.report())

    with timer.stage("image_swap", items=1):
        img = pipe.swap_image(frames[0], source)
    print("image:", img.shape)


if __name__ == "__main__":
    main()
