"""Regenerate the bundled smoke fixture (smoke_input.jpg / smoke_gt.png).

A synthetic stand-in for the reference's bundled cat photo: a textured
512x512 scene containing one large irregular foreground blob labelled as
PASCAL class 8 ("cat"), with a VOC-style 255-ignore ring at the object
boundary. Deterministic (fixed seed) so the fixture is reproducible.
"""

import os

import numpy as np
from PIL import Image

SIZE = 512
CLASS_ID = 8


def _fbm_noise(rng, size, octaves=5):
    """Cheap fractal noise: sum of upsampled random grids."""
    out = np.zeros((size, size), np.float32)
    for o in range(octaves):
        n = 2 ** (o + 3)
        grid = rng.standard_normal((n, n)).astype(np.float32)
        img = Image.fromarray(grid, mode="F").resize((size, size), Image.BILINEAR)
        out += np.asarray(img) / (2.0 ** o)
    out -= out.min()
    out /= out.max()
    return out


def make_fixture(dest_dir):
    rng = np.random.default_rng(20260816)
    yy, xx = np.mgrid[0:SIZE, 0:SIZE].astype(np.float32)

    # Irregular blob: ellipse whose radius is modulated by low-freq sinusoids.
    cy, cx = 270.0, 240.0
    theta = np.arctan2(yy - cy, xx - cx)
    wobble = (22 * np.sin(3 * theta + 0.7) + 14 * np.sin(7 * theta - 1.9)
              + 9 * np.sin(11 * theta + 0.2))
    r = np.hypot((yy - cy) / 1.15, (xx - cx) / 0.95)
    inside = r < (150.0 + wobble)

    noise_bg = _fbm_noise(rng, SIZE)
    noise_fg = _fbm_noise(rng, SIZE, octaves=6)

    img = np.zeros((SIZE, SIZE, 3), np.float32)
    # Background: grass-to-sky vertical blend with texture.
    t = yy / SIZE
    img[..., 0] = 0.35 + 0.25 * t + 0.15 * noise_bg
    img[..., 1] = 0.55 - 0.10 * t + 0.20 * noise_bg
    img[..., 2] = 0.70 - 0.35 * t + 0.10 * noise_bg
    # Foreground: warm striped fur-ish texture.
    stripes = 0.5 + 0.5 * np.sin(0.12 * xx + 25 * noise_fg)
    fg = np.stack([0.55 + 0.30 * stripes, 0.35 + 0.20 * stripes,
                   0.20 + 0.10 * noise_fg], axis=-1)
    img = np.where(inside[..., None], fg, img)
    img = np.clip(img + 0.02 * rng.standard_normal(img.shape), 0, 1)

    gt = np.where(inside, CLASS_ID, 0).astype(np.uint8)
    # VOC-style ignore ring: pixels whose 5x5 neighborhood mixes fg and bg.
    pad = np.pad(inside, 2)
    windows = np.stack([pad[dy:dy + SIZE, dx:dx + SIZE]
                        for dy in range(5) for dx in range(5)])
    boundary = windows.any(0) & ~windows.all(0)
    gt[boundary] = 255

    os.makedirs(dest_dir, exist_ok=True)
    Image.fromarray((img * 255).astype(np.uint8)).save(
        os.path.join(dest_dir, "smoke_input.jpg"), quality=92)
    Image.fromarray(gt, mode="L").save(os.path.join(dest_dir, "smoke_gt.png"))
    print(f"wrote smoke_input.jpg / smoke_gt.png to {dest_dir}")


if __name__ == "__main__":
    make_fixture(os.path.dirname(os.path.abspath(__file__)) or ".")
