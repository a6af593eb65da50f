# ghost-tpu serving/training image (reference parity: Dockerfile:2-77,
# run.sh — redesigned for a Cloud TPU VM instead of a CUDA base image).
#
# Build:   docker build -t ghost-tpu .
# Smoke:   docker run --rm ghost-tpu \
#            python -m ghost_tpu.cli.inference --help
# On a TPU VM, run with --privileged --net=host so libtpu can reach the
# chips; on CPU-only hosts everything still works (jax falls back).
#
# Weights are NOT baked in (they are per-deployment): mount a volume at
# /weights and convert once with ghost-tpu-convert — see docs/WEIGHTS.md.

FROM python:3.11-slim

# g++/make: self-build of the native host runtime (libghost_rt.so).
# ffmpeg: audio mux for video swaps (pipeline/video.py).
RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make ffmpeg \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/ghost-tpu

# TPU runtime: jax[tpu] pulls libtpu from the Google releases index.
# CPU-only deployments can drop the extra and the -f index line.
RUN pip install --no-cache-dir "jax[tpu]" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

# The package itself + IO edge (cv2). Torch is only needed for weight
# conversion; convert on a beefier box and ship msgpack (docs/WEIGHTS.md),
# or `pip install .[convert]` here instead.
COPY pyproject.toml ./
COPY ghost_tpu ./ghost_tpu
RUN pip install --no-cache-dir ".[io]"

# Pre-build the native runtime so first inference doesn't pay the compile.
RUN python -c "from ghost_tpu.data.frames import native_available; \
        assert native_available(), 'libghost_rt.so build failed'"

# Persistent XLA compilation cache across container restarts (mount a
# volume here in production — cold compiles of the fused video program
# are expensive, cached ones are instant).
ENV GHOST_TPU_JAX_CACHE=/cache/jax
VOLUME ["/cache", "/weights"]

ENTRYPOINT ["ghost-tpu-inference"]
CMD ["--help"]
