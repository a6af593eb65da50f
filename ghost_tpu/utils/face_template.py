"""Face-layout template injection for random-weight landmark nets.

With random weights, `models.landmark.Landmark106`'s tanh head outputs
near-zero values, so all 106 decoded points cluster at the crop center;
the convex-hull mask (`ops/mask.py`) then erodes to EMPTY and the
paste-back blend becomes a no-op. Any end-to-end test or metric run on
random weights would "pass" without exercising the blend at all
(round-3 finding: the round-2 composition-parity bounds were partly
trivial for exactly this reason).

`inject_landmark_template` rewrites the net's final Dense layer so its
output is a plausible 106-point face layout (tanh-space bias =
atanh(template)) plus a small input-dependent wiggle (kernel scaled
down). The net still runs its full conv stack and still responds to its
input — but its landmarks now describe a face-sized oval, the mask is a
real soft region, and the blend path is genuinely exercised.

The template places the insightface-layout brow/eye index groups used
by `ops.mask.expand_eyebrows` (masks.py:10-19) consistently: brows
above eyes, contour on an oval.
"""

from __future__ import annotations

import numpy as np

# index groups (must match ops/mask.py)
_EYE_TOP_L = np.array([35, 41, 40, 42, 39])
_EYE_TOP_R = np.array([89, 95, 94, 96, 93])
_BROW_L = np.array([43, 48, 49, 51, 50])
_BROW_R = np.array([102, 103, 104, 105, 101])


def face_template_106() -> np.ndarray:
    """(106, 2) layout in tanh space [-1, 1] (x right, y down)."""
    pts = np.zeros((106, 2), np.float32)
    # face contour: oval through the first 33 indices
    th = np.linspace(0, 2 * np.pi, 33, endpoint=False)
    pts[:33, 0] = 0.62 * np.sin(th)
    pts[:33, 1] = 0.72 * np.cos(th)
    # everything else: inner-face ellipse (nose/mouth/eye region filler)
    th2 = np.linspace(0, 2 * np.pi, 106 - 33, endpoint=False)
    pts[33:, 0] = 0.30 * np.sin(th2)
    pts[33:, 1] = 0.25 * np.cos(th2) + 0.15
    # eyes and brows at plausible spots (brows ABOVE eye tops so
    # expand_eyebrows pushes them further up, like a real face)
    for idx, (cx, cy) in ((_EYE_TOP_L, (-0.30, -0.20)),
                          (_EYE_TOP_R, (0.30, -0.20)),
                          (_BROW_L, (-0.30, -0.38)),
                          (_BROW_R, (0.30, -0.38))):
        off = np.linspace(-0.12, 0.12, len(idx))
        pts[idx, 0] = cx + off
        pts[idx, 1] = cy
    return np.clip(pts, -0.9, 0.9)


def inject_detection_template(det_vars, d: float = 6.0,
                              wiggle_scale: float = 0.05):
    """Return a copy of random-weight SCRFD variables whose shared head
    proposes geometrically plausible faces everywhere.

    With random weights the head's kps offsets are arbitrary, so any
    composition built on the detected 5-pt alignment (the enhancer's
    umeyama to the FFHQ template) is exercised on degenerate geometry.
    This rewrites the head's three output convs (models/scrfd.py
    SCRFDHead 'score'/'bbox'/'kps'):

      * kps bias = a face-like 5-pt constellation in STRIDE units
        (decode_detections multiplies raw kps by the stride, so the
        constellation scales with the pyramid level), proportioned
        like facexlib's FFHQ template (eyes / nose / mouth corners);
      * bbox bias = a matching square-ish box (l,t,r,b stride units);
      * score bias = logit(0.7) with the kernel scaled down, so every
        location fires at ~0.7 plus a small input-dependent wiggle —
        NMS then keeps a deterministic, input-dependent, spatially
        spread set of plausible "faces".

    The backbone/neck still run and still shape the wiggle; only the
    head's output statistics are pinned.
    """
    import jax

    # FFHQ-template proportions, centered, in units of d strides:
    # eye span ~ 1.1d, nose below center, mouth corners low
    kps5 = np.array([[-0.55, -0.30], [0.55, -0.30], [0.0, 0.35],
                     [-0.48, 0.85], [0.48, 0.85]], np.float32) * d
    box = np.array([d, 1.2 * d, d, 1.5 * d], np.float32)  # l,t,r,b

    vars_ = jax.tree.map(lambda x: x, det_vars)
    params = dict(vars_["params"])
    head = dict(params["head"])
    for name, bias in (
        ("score", np.full((2,), np.log(0.7 / 0.3), np.float32)),
        ("bbox", np.tile(box, 2)),
        ("kps", np.tile(kps5.reshape(-1), 2)),
    ):
        # nn/layers.Conv wraps the flax conv as 'Conv_0'
        outer = dict(head[name])
        conv = dict(outer["Conv_0"])
        conv["kernel"] = conv["kernel"] * wiggle_scale
        conv["bias"] = conv["bias"] * wiggle_scale + bias
        outer["Conv_0"] = conv
        head[name] = outer
    params["head"] = head
    out = dict(vars_)
    out["params"] = params
    return out


def inject_landmark_template(lmk_vars, fc_name: str = "fc",
                             wiggle_scale: float = 0.02):
    """Return a copy of the Landmark106 variables whose `fc` layer
    outputs atanh(face_template_106()) + wiggle_scale * (original)."""
    import jax

    tmpl = face_template_106().reshape(-1)
    bias = np.arctanh(tmpl).astype(np.float32)

    vars_ = jax.tree.map(lambda x: x, lmk_vars)  # shallow-ish copy
    params = dict(vars_["params"])
    fc = dict(params[fc_name])
    fc["kernel"] = fc["kernel"] * wiggle_scale
    fc["bias"] = fc["bias"] * wiggle_scale + bias
    params[fc_name] = fc
    out = dict(vars_)
    out["params"] = params
    return out
