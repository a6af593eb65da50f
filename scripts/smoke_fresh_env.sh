#!/usr/bin/env bash
# Fresh-environment smoke (VERDICT r2 item 9 / reference Dockerfile:2-77):
# build the wheel, install it into a clean venv (system site-packages give
# the offline box its jax/numpy/cv2 — a networked box would pip install the
# deps from pyproject instead), then run the image-to-image inference CLI
# with random weights from OUTSIDE the repo, proving:
#   * the wheel is self-contained (no repo checkout needed),
#   * libghost_rt.so self-builds from the packaged C++ sources,
#   * the ghost-tpu-inference console entry point works.
# Usage: bash scripts/smoke_fresh_env.sh   (takes ~1-2 min on the 1-core box)
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="$(mktemp -d /tmp/ghost_smoke.XXXXXX)"
trap 'rm -rf "$WORK"' EXIT

echo "== build wheel"
pip wheel "$REPO" --no-deps --no-build-isolation -w "$WORK/wheels" -q
WHEEL=$(ls "$WORK"/wheels/*.whl)

echo "== fresh venv"
python -m venv --system-site-packages "$WORK/venv"
# offline substitute for `pip install ghost-tpu[io]` dependency
# resolution: expose the host's dependency set (jax/numpy/cv2/...) to
# the fresh venv. (--system-site-packages alone is not enough when the
# host python is itself a venv, as on this box.)
HOST_SP=$(python -c "import numpy, os; print(os.path.dirname(os.path.dirname(numpy.__file__)))")
VENV_SP=$("$WORK/venv/bin/python" -c "import sysconfig; print(sysconfig.get_paths()['purelib'])")
echo "$HOST_SP" > "$VENV_SP/host_deps.pth"
"$WORK/venv/bin/pip" install --no-deps --no-index -q "$WHEEL"

echo "== smoke: image-to-image swap, random weights, from /tmp"
cd "$WORK"
"$WORK/venv/bin/python" - <<'EOF'
import os, sys
assert "ghost_tpu" not in os.listdir("."), "must run outside the repo"
import jax
jax.config.update("jax_platforms", "cpu")  # JAX_PLATFORMS env is ignored
                                           # under the axon sitecustomize
import numpy as np, cv2
import ghost_tpu
pkg = os.path.dirname(ghost_tpu.__file__)
assert "/venv/" in pkg or "site-packages" in pkg, f"imported from {pkg}"

rng = np.random.default_rng(0)
cv2.imwrite("src.png", rng.integers(0, 255, (128, 128, 3), dtype=np.uint8))
cv2.imwrite("tgt.png", rng.integers(0, 255, (160, 200, 3), dtype=np.uint8))

from ghost_tpu.data.frames import native_available, _build_lib
assert native_available(), "packaged libghost_rt.so failed to self-build"
print("native runtime:", _build_lib())

from ghost_tpu.cli.inference import main
sys.argv = ["ghost-tpu-inference",
            "--source_paths", "src.png", "--image_to_image", "1",
            "--target_image", "tgt.png", "--out_image_name", "out.png",
            "--allow_random_weights", "1", "--batch_size", "2",
            "--arcface_depth", "tiny", "--det_size", "320"]
main()
out = cv2.imread("out.png")
assert out is not None and out.shape == (160, 200, 3), out
print("SMOKE OK:", out.shape)
EOF
# console entry point resolves (argparse help exercises import wiring)
"$WORK/venv/bin/ghost-tpu-inference" --help >/dev/null
echo "entry point OK"
echo "ALL SMOKE CHECKS PASSED"
