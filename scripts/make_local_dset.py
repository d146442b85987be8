"""Build a clean-image training/eval corpus from locally available sources.

The reference trains on a private ``rnind_bsd_div2k`` clean-image tree with
AWGN injected on the fly (``/root/reference/configs/train_cfg.json`` points
x_path and y_path at the same clean folder; noise comes from ``AddAWGN``,
scripts/train.py:58-59). This environment has no network egress, so this
script assembles the same *kind* of corpus — diverse clean RGB images at
>=256x256 — from what ships inside local packages plus procedural
generation:

* natural photos: sklearn's china.jpg / flower.jpg sample images and
  matplotlib's grace_hopper.jpg (hopper is HELD OUT for eval so the eval
  content is never seen in training);
* terrain textures: matplotlib's jacksboro DEM / topobathy arrays,
  normalized and color-graded;
* procedural images: piecewise-smooth "cartoon" scenes (random ellipses,
  polygons, gradients) and multi-scale filtered-noise textures — the
  image classes TV-regularized restoration is designed around.

Output layout matches the trainer contract (clean targets, x==y):
``<save>/train/`` and ``<save>/eval/`` folders of PNG tiles.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _dihedral(img: np.ndarray):
    """All 8 flips/rotations of an HWC image."""
    out = []
    for k in range(4):
        r = np.rot90(img, k)
        out.append(r)
        out.append(r[:, ::-1])
    return out


def _tiles(img: np.ndarray, size: int, stride: int):
    h, w = img.shape[:2]
    for top in range(0, max(1, h - size + 1), stride):
        for left in range(0, max(1, w - size + 1), stride):
            t = img[top : top + size, left : left + size]
            if t.shape[0] == size and t.shape[1] == size:
                yield t


def natural_images():
    """Local natural photos as float32 HWC in [0,1]: (name, image, split)."""
    from matplotlib import cbook
    from PIL import Image
    from sklearn.datasets import load_sample_images

    out = []
    sk = load_sample_images()
    for arr, fname in zip(sk.images, sk.filenames):
        out.append((Path(fname).stem, np.asarray(arr, np.float32) / 255.0, "train"))
    hopper = np.asarray(
        Image.open(cbook.get_sample_data("grace_hopper.jpg", asfileobj=False)),
        np.float32,
    ) / 255.0
    out.append(("hopper", hopper, "eval"))
    return out


def terrain_images():
    """DEM arrays -> color-graded RGB textures."""
    from matplotlib import cbook

    out = []
    for name, key in (("jacksboro", "jacksboro_fault_dem.npz"), ("topobathy", "topobathy.npz")):
        try:
            with cbook.get_sample_data(key) as f:
                data = np.load(f)
                elev = np.asarray(data[list(data.keys())[0]], np.float64)
        except Exception:
            continue
        elev = (elev - elev.min()) / max(float(np.ptp(elev)), 1e-9)
        # three phase-shifted tone curves -> a smooth false-color RGB
        rgb = np.stack(
            [np.clip(1.5 * elev - s, 0.0, 1.0) ** 0.8 for s in (0.0, 0.25, 0.5)], axis=-1
        ).astype(np.float32)
        out.append((name, rgb, "train"))
    return out


def _smooth_field(rng, size, scale):
    """Low-frequency random field via upsampled coarse noise."""
    coarse = rng.standard_normal((scale, scale))
    # bilinear upsample with numpy
    xi = np.linspace(0, scale - 1, size)
    f = np.empty((size, size))
    rows = np.empty((scale, size))
    for r in range(scale):
        rows[r] = np.interp(xi, np.arange(scale), coarse[r])
    for c in range(size):
        f[:, c] = np.interp(xi, np.arange(scale), rows[:, c])
    return f


def procedural_images(rng: np.random.Generator, n: int, size: int = 320):
    """Piecewise-smooth scenes + multiscale textures (TV image classes)."""
    out = []
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float64) / size
    for i in range(n):
        kind = i % 3
        img = np.zeros((size, size, 3), np.float64)
        if kind == 0:  # cartoon: smooth background + filled ellipses/boxes
            base = np.stack([_smooth_field(rng, size, 4) for _ in range(3)], -1)
            img = 0.5 + 0.2 * base
            for _ in range(rng.integers(4, 12)):
                cy, cx = rng.random(2)
                ry, rx = 0.05 + 0.25 * rng.random(2)
                theta = rng.random() * np.pi
                color = rng.random(3)
                dy, dx = yy - cy, xx - cx
                u = dy * np.cos(theta) + dx * np.sin(theta)
                v = -dy * np.sin(theta) + dx * np.cos(theta)
                mask = (u / ry) ** 2 + (v / rx) ** 2 < 1.0
                img[mask] = color
        elif kind == 1:  # multiscale texture
            acc = np.zeros((size, size))
            for s, w in ((4, 1.0), (8, 0.6), (16, 0.35), (32, 0.2)):
                acc += w * _smooth_field(rng, size, s)
            acc = (acc - acc.min()) / max(float(np.ptp(acc)), 1e-9)
            phase = rng.random(3) * 0.5
            img = np.stack([np.clip(acc * (0.6 + p) + 0.2 * p, 0, 1) for p in phase], -1)
        else:  # gradients + thin structures (edges/lines)
            g = np.outer(np.linspace(0, 1, size), np.ones(size))
            ang = rng.random() * np.pi
            grad = g * np.cos(ang) + g.T * np.sin(ang)
            img = np.stack([grad * c for c in 0.4 + 0.6 * rng.random(3)], -1)
            for _ in range(rng.integers(6, 20)):
                y0, x0 = (rng.random(2) * size).astype(int)
                length = int(size * (0.2 + 0.6 * rng.random()))
                thick = rng.integers(1, 6)
                dy, dx = rng.standard_normal(2)
                nrm = max(np.hypot(dy, dx), 1e-9)
                color = rng.random(3)
                for t in range(length):
                    y = int(y0 + t * dy / nrm)
                    x = int(x0 + t * dx / nrm)
                    if 0 <= y < size - thick and 0 <= x < size - thick:
                        img[y : y + thick, x : x + thick] = color
        out.append((f"proc{i:03d}", np.clip(img, 0, 1).astype(np.float32), "train"))
    return out


def main():
    parser = argparse.ArgumentParser(description="Assemble local clean-image corpus")
    parser.add_argument("--save", "-s", default="datasets/local_clean")
    parser.add_argument("--tile", type=int, default=288,
                        help="tile size (>=256 so RandCrop 256 has jitter)")
    parser.add_argument("--n_procedural", type=int, default=120)
    parser.add_argument("--n_procedural_eval", type=int, default=4)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from PIL import Image

    rng = np.random.default_rng(args.seed)
    dirs = {}
    for split in ("train", "eval"):
        d = Path(args.save) / split
        d.mkdir(parents=True, exist_ok=True)
        dirs[split] = d

    counts = {"train": 0, "eval": 0}
    eval_rng = np.random.default_rng(args.seed + 7919)
    eval_procs = [
        (f"evalproc{i:02d}", im, "eval")
        for i, (_, im, _) in enumerate(procedural_images(eval_rng, args.n_procedural_eval))
    ]
    sources = natural_images() + terrain_images() + procedural_images(
        rng, args.n_procedural
    ) + eval_procs
    for name, img, split in sources:
        tile = min(args.tile, min(img.shape[:2]))
        stride = max(tile // 3, 1)
        if split == "train" and name in ("china", "flower", "jacksboro", "topobathy"):
            variants = _dihedral(img)
        elif name == "hopper":
            variants = [img, img[:, ::-1]]  # mirror doubles the held-out pool
        else:
            variants = [img]
        for vi, var in enumerate(variants):
            for ti, t in enumerate(_tiles(var, tile, stride)):
                arr = (np.clip(t, 0, 1) * 255.0 + 0.5).astype(np.uint8)
                Image.fromarray(arr).save(dirs[split] / f"{name}_v{vi}_t{ti:03d}.png")
                counts[split] += 1
    print(f"written: {counts} (tile={args.tile})")


if __name__ == "__main__":
    main()
