"""Host-side image preprocessing (numpy + cv2), channel-last.

Rebuild of /root/reference/util/util_img.py's preprocessing surface:
aspect-preserving resize, brightness/contrast/saturation jitter in random
order, AlexNet PCA lighting noise, ImageNet color normalize/denormalize,
binarize, bbox, square crop-with-pad.  All randomness goes through an
explicit ``numpy.random.Generator`` (the reference uses the global state).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import cv2
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# AlexNet PCA lighting (util_img.py:284-289)
_LIGHT_EIGVALS = np.array([0.2175, 0.0188, 0.0045])
_LIGHT_EIGVECS = np.array([
    [-0.5675, 0.7192, 0.4009],
    [-0.5808, -0.0045, -0.8140],
    [-0.5836, -0.6948, 0.4203],
])


def imread_rgb(path: str) -> np.ndarray:
    """Read an image as float RGB in [0, 1], normalized by the dtype max
    (datasets/shapenet.py:171-176 semantics)."""
    im = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if im is None:
        raise FileNotFoundError(path)
    if im.ndim == 3 and im.shape[2] >= 3:
        im = cv2.cvtColor(im, cv2.COLOR_BGR2RGB if im.shape[2] == 3
                          else cv2.COLOR_BGRA2RGB)
    maxv = np.iinfo(im.dtype).max if np.issubdtype(im.dtype, np.integer) else 1.0
    return im.astype(np.float64) / maxv


def imwrite_rgb(path: str, im01: np.ndarray) -> None:
    im = np.clip(im01, 0.0, 1.0)
    im = (im * 255).astype(np.uint8)
    if im.ndim == 3:
        im = cv2.cvtColor(im, cv2.COLOR_RGB2BGR)
    cv2.imwrite(path, im)


def resize(im: np.ndarray, target_size: int, which_dim: str = "horizontal",
           clamp: Optional[Tuple[float, float]] = None) -> np.ndarray:
    """Aspect-preserving bicubic resize (util_img.py:124-168)."""
    h, w = im.shape[:2]
    scale = target_size / (w if which_dim == "horizontal" else h)
    out = cv2.resize(im, None, fx=scale, fy=scale,
                     interpolation=cv2.INTER_CUBIC)
    if clamp is not None:
        out = np.clip(out, clamp[0], clamp[1])
    return out


def rgb2gray(rgb: np.ndarray) -> np.ndarray:
    ch = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    return np.stack([ch, ch, ch], axis=-1)


def jitter_colors(rgb: np.ndarray, d_brightness: float = 0.0,
                  d_contrast: float = 0.0, d_saturation: float = 0.0,
                  rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Randomize brightness/contrast/saturation in random order
    (util_img.py:253-279): out = alpha*im + (1-alpha)*base with
    alpha ~ U[1-d, 1+d]; base = 0 / mean gray / gray image."""
    rng = rng or np.random.default_rng()
    out = rgb.astype(np.float64, copy=True)
    attrs = ["brightness", "contrast", "saturation"]
    ds = [d_brightness, d_contrast, d_saturation]
    order = rng.permutation(3)
    for i in order:
        alpha = 1.0 + rng.uniform(-ds[i], ds[i]) if ds[i] > 0 else 1.0
        if attrs[i] == "brightness":
            base = 0.0
        elif attrs[i] == "contrast":
            base = float(np.mean(rgb2gray(out)[..., 0]))
        else:
            base = rgb2gray(out)
        out = alpha * out + (1.0 - alpha) * base
    return out


def add_lighting_noise(rgb01: np.ndarray, alpha_std: float,
                       rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """AlexNet PCA lighting noise (util_img.py:282-329)."""
    rng = rng or np.random.default_rng()
    alpha = rng.normal(0.0, alpha_std, size=3)
    noise = (_LIGHT_EIGVECS * alpha[None, :] * _LIGHT_EIGVALS[None, :]).sum(1)
    return rgb01.astype(np.float64) + noise[None, None, :]


def normalize_colors(rgb01: np.ndarray,
                     mean: Sequence[float] = IMAGENET_MEAN,
                     std: Sequence[float] = IMAGENET_STD) -> np.ndarray:
    return (rgb01 - np.asarray(mean)) / np.asarray(std)


def denormalize_colors(rgb_norm: np.ndarray,
                       mean: Sequence[float] = IMAGENET_MEAN,
                       std: Sequence[float] = IMAGENET_STD) -> np.ndarray:
    return rgb_norm * np.asarray(std) + np.asarray(mean)


def binarize(im: np.ndarray, thres: float, gt_is_1: bool = True) -> np.ndarray:
    if gt_is_1:
        return (im > thres).astype(im.dtype if im.dtype.kind == "f"
                                   else np.float64)
    return (im <= thres).astype(im.dtype if im.dtype.kind == "f"
                                else np.float64)


def depth_to_mesh_df(depth_hw: np.ndarray, minmax, vox_res: int = 128,
                     cam_dist: float = 2.2) -> np.ndarray:
    """Host-side depth -> truncated distance field (numpy).

    CPU twin of ops.camera_backproject, mirroring the role of
    /root/reference/util/util_img.py:53-90 (depth_to_mesh_df), which was
    the CPU reimplementation of the cam_bp CUDA kernel.  ``depth_hw`` is
    relative depth in [0, 1] with background 0; ``minmax`` are the
    absolute (min, max) bounds.
    """
    import jax.numpy as jnp

    from ..ops import camera_backproject, coords, FL_GENRE

    depth = np.asarray(depth_hw, np.float32)
    dmin, dmax = float(minmax[0]), float(minmax[1])
    mask = depth > 0
    abs_depth = np.where(mask, (1.0 - depth) * (dmax - dmin + 1e-4) + dmin,
                         0.0).astype(np.float32)
    d = coords.depth_image_to_cambp_frame(jnp.asarray(abs_depth)[None])
    tdf = camera_backproject(d, FL_GENRE, cam_dist, vox_res)
    return np.asarray(tdf)[0]


def get_bbox(mask01: np.ndarray, th: float = 0.95):
    """[tl_w, tl_h, br_w, br_h] of mask > th (util_img.py:421-427)."""
    m = mask01[..., 0] if mask01.ndim == 3 else mask01
    indh, indw = np.where(m > th)
    if indh.size == 0:
        raise ValueError("empty mask -- no pixels above threshold")
    return [int(indw.min()), int(indh.min()), int(indw.max()), int(indh.max())]


def crop(img: np.ndarray, bbox, out_size: int, pad: int,
         pad_zero: bool = True) -> np.ndarray:
    """Square crop centred on the bbox, scaled so the object occupies
    (out_size - 2*pad) pixels, padded at borders (util_img.py:430-474)."""
    y1, x1, y2, x2 = bbox
    h, w = img.shape[0], img.shape[1]
    x_mid, y_mid = (x1 + x2) / 2.0, (y1 + y2) / 2.0
    side = max(x2 - x1, y2 - y1) * out_size / (out_size - 2.0 * pad)
    x1 = int(np.round(x_mid - side / 2.0))
    x2 = int(np.round(x_mid + side / 2.0))
    y1 = int(np.round(y_mid - side / 2.0))
    y2 = int(np.round(y_mid + side / 2.0))
    b_x = max(0, -x1); x1 = max(0, x1)
    b_y = max(0, -y1); y1 = max(0, y1)
    a_x = max(0, x2 - (h - 1)); x2 = min(x2, h - 1)
    a_y = max(0, y2 - (w - 1)); y2 = min(y2, w - 1)
    style = ({"mode": "constant", "constant_values": 0} if pad_zero
             else {"mode": "edge"})
    pads = ((b_x, a_x), (b_y, a_y)) + (((0, 0),) if img.ndim == 3 else ())
    img_crop = np.pad(img[x1:x2 + 1, y1:y2 + 1], pads, **style)
    return cv2.resize(img_crop, (out_size, out_size))
