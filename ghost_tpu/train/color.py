"""Color-space training helpers (reference utils/training/helpers.py).

  * get_hsv / hsv_to_rgb / modify_images_with_hsv (:8-92) — RGB<->HSV on
    pm1/01 NHWC batches, branchless (the reference's boolean-mask
    indexing becomes jnp.where selects, which XLA fuses);
  * color_consistency_loss (:150-182) — penalize center-vs-edge color
    shifts;
  * stuck_loss (:95-115) — penalize high-frequency gradients inside a
    region (anti-artifact).
"""

from __future__ import annotations

import jax.numpy as jnp


def get_hsv(img_pm1, eps: float = 1e-7):
    """pm1 RGB NHWC -> HSV NHWC with h,s,v in [0,1] (helpers.py:8-24)."""
    img = img_pm1 * 0.5 + 0.5
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    mx = jnp.max(img, axis=-1)
    mn = jnp.min(img, axis=-1)
    rng = mx - mn + eps

    h_r = ((g - b) / rng) % 6.0
    h_g = (b - r) / rng + 2.0
    h_b = (r - g) / rng + 4.0
    # priority order matches the reference's assignment sequence: the
    # LAST write wins there (b==max, then g==max, then r==max)
    hue = jnp.where(b == mx, h_b, 0.0)
    hue = jnp.where(g == mx, h_g, hue)
    hue = jnp.where(r == mx, h_r, hue)
    hue = jnp.where(mn == mx, 0.0, hue) / 6.0

    sat = jnp.where(mx == 0, 0.0, (mx - mn) / (mx + eps))
    return jnp.stack([hue, sat, mx], axis=-1)


def hsv_to_rgb(hsv):
    """HSV NHWC (01) -> RGB 01 NHWC (helpers.py:26-66)."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    c = v * s
    h6 = h * 6.0
    x = c * (1.0 - jnp.abs(h6 % 2.0 - 1.0))
    m = v - c
    k = jnp.floor(h6)

    def sel(vals):
        out = jnp.zeros_like(h)
        for idx, val in enumerate(vals):
            out = jnp.where((k == idx) | ((idx == 0) & (k == 6)), val, out)
        return out

    z = jnp.zeros_like(h)
    r = sel([c, x, z, z, x, c])
    g = sel([x, c, c, x, z, z])
    b = sel([z, z, x, c, c, x])
    return jnp.stack([r + m, g + m, b + m], axis=-1)


def modify_images_with_hsv(batch_src_pm1, batch_dst_pm1):
    """Replace dst's HSV with src's (helpers.py:69-92) -> RGB 01."""
    return hsv_to_rgb(get_hsv(batch_src_pm1))


def color_consistency_loss(batch, center=(30, 30, 50, 50),
                           edge=(0, 0, 112, 112)):
    """Center-region color shift vs edge-region mean (helpers.py:150-182)."""
    cx, cy, cw, ch = center
    ex, ey, ew, eh = edge
    c = batch[:, cy:cy + ch, cx:cx + cw, :]
    e = batch[:, ey:ey + eh, ex:ex + ew, :]
    e_mean = jnp.mean(e, axis=(1, 2), keepdims=True)
    c_mean = jnp.mean(c, axis=(1, 2), keepdims=True)
    adjusted = c - (c_mean - e_mean)
    return jnp.mean(jnp.square(adjusted - c))


def stuck_loss(output, region, weight: float = 0.5):
    """Gradient-smoothness penalty in a region (helpers.py:95-115)."""
    x, y, h, w = region
    r = output[:, y:y + h, x:x + w, :]
    gx = jnp.abs(r[:, :, 1:, :] - r[:, :, :-1, :])
    gy = jnp.abs(r[:, 1:, :, :] - r[:, :-1, :, :])
    mh = min(gx.shape[1], gy.shape[1])
    mw = min(gx.shape[2], gy.shape[2])
    gx = gx[:, :mh, :mw]
    gy = gy[:, :mh, :mw]
    return weight * jnp.mean(gx * gx + gy * gy)


def is_any_nan(tree) -> bool:
    """Host-side NaN guard (reference train-self.py:45-50)."""
    import jax
    import numpy as np

    for leaf in jax.tree.leaves(tree):
        if not np.all(np.isfinite(np.asarray(leaf))):
            return True
    return False
