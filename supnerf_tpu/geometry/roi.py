"""ROI processing and image pre-processing.

Host-side (numpy/cv2) equivalents of the reference's ROI + image utilities
(/root/reference/src/utils.py: roi_process :1392, roi_resize :1418,
roi_coord_trans :1384, preprocess_img_square :53, preprocess_occ_square :75,
preprocess_img_keepratio :39, image_float_to_uint8 :686).

These run in the data path (outside jit) because crop sizes are inherently
dynamic; they produce fixed-size arrays that the device-side pipeline consumes.
A jnp bilinear resize is also provided for in-jit resizing of fixed-size crops.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import jax


def roi_process(roi, H=None, W=None, roi_margin: int = 0, sq_pad: bool = False):
    """Expand an [xmin, ymin, xmax, ymax] roi by a margin, optionally pad to
    square, then clip to image bounds. Integer in/out (numpy)."""
    roi_new = np.asarray(roi, dtype=np.float64).copy()
    roi_new[0:2] -= roi_margin
    roi_new[2:4] += roi_margin
    if sq_pad:
        cx = (roi_new[0] + roi_new[2]) / 2
        cy = (roi_new[1] + roi_new[3]) / 2
        sz = np.maximum(roi_new[2] - roi_new[0], roi_new[3] - roi_new[1])
        roi_new[0], roi_new[2] = cx - sz / 2, cx + sz / 2
        roi_new[1], roi_new[3] = cy - sz / 2, cy + sz / 2
    if H is not None and W is not None:
        roi_new[0:2] = np.maximum(roi_new[0:2], 0)
        roi_new[2] = np.minimum(roi_new[2], W - 1)
        roi_new[3] = np.minimum(roi_new[3], H - 1)
    return roi_new.astype(np.int32)


def roi_resize(roi, ratio: float = 1.0):
    """Scale an roi about its center by `ratio` (float out)."""
    min_x, min_y, max_x, max_y = [float(v) for v in roi]
    cx, cy = (min_x + max_x) / 2, (min_y + max_y) / 2
    bw, bh = max_x - min_x, max_y - min_y
    return [cx - bw / 2 * ratio, cy - bh / 2 * ratio, cx + bw / 2 * ratio, cy + bh / 2 * ratio]


def roi_coord_trans(x_vec, y_vec, roi_src, im_sz_tgt: int):
    """Map pixel coords in a source ROI crop to the resized target square frame."""
    roi_w = roi_src[2] - roi_src[0]
    roi_h = roi_src[3] - roi_src[1]
    x_new = (x_vec - roi_w / 2) / roi_w * im_sz_tgt + im_sz_tgt / 2
    y_new = (y_vec - roi_h / 2) / roi_h * im_sz_tgt + im_sz_tgt / 2
    return x_new, y_new


def resize_bilinear_np(img: np.ndarray, out_hw) -> np.ndarray:
    """Host bilinear resize with half-pixel centers (== torchvision Resize on
    tensors / cv2 INTER_LINEAR). img: (H, W, C) or (H, W)."""
    import cv2

    out = cv2.resize(
        np.ascontiguousarray(img, dtype=np.float32),
        (int(out_hw[1]), int(out_hw[0])),
        interpolation=cv2.INTER_LINEAR,
    )
    return out


def resize_bilinear_jnp(img, out_hw):
    """In-jit bilinear resize with half-pixel centers for (H, W, C) arrays."""
    h, w = int(out_hw[0]), int(out_hw[1])
    # antialias=False: cv2 INTER_LINEAR / torchvision-0.13 tensor Resize do
    # plain bilinear without the antialiasing prefilter on downscale.
    return jax.image.resize(img, (h, w) + img.shape[2:], method="linear",
                            antialias=False)


def preprocess_img_square(img: np.ndarray, new_size: int = 128, pad_white: bool = True) -> np.ndarray:
    """Resize the larger dim to new_size, pad the other to a centered square.

    img: (H, W, 3) float in [0, 1]. Returns (new_size, new_size, 3) float32.
    The padding is white by default (the reference's white-background convention).
    """
    im_h, im_w = img.shape[:2]
    ratio = new_size / max(im_h, im_w)
    new_h, new_w = int(im_h * ratio), int(im_w * ratio)
    resized = resize_bilinear_np(img, (new_h, new_w))
    fill = 1.0 if pad_white else 0.0
    out = np.full((new_size, new_size, 3), fill, dtype=np.float32)
    y0 = int(new_size / 2 - new_h / 2)
    x0 = int(new_size / 2 - new_w / 2)
    out[y0 : y0 + new_h, x0 : x0 + new_w] = resized.reshape(new_h, new_w, -1)[:, :, :3]
    return out


def preprocess_occ_square(occ_mask: np.ndarray, new_size: int = 128, pad_value: float = -1.0) -> np.ndarray:
    """Same layout as preprocess_img_square for the {-1, 0, 1} occupancy mask;
    bilinear then floor, padding with pad_value. occ_mask: (H, W)."""
    im_h, im_w = occ_mask.shape[:2]
    ratio = new_size / max(im_h, im_w)
    new_h, new_w = int(im_h * ratio), int(im_w * ratio)
    resized = resize_bilinear_np(occ_mask.astype(np.float32), (new_h, new_w))
    out = np.full((new_size, new_size), float(pad_value), dtype=np.float32)
    y0 = int(new_size / 2 - new_h / 2)
    x0 = int(new_size / 2 - new_w / 2)
    out[y0 : y0 + new_h, x0 : x0 + new_w] = resized
    return np.floor(out)


def preprocess_img_keepratio(img: np.ndarray, max_img_sz: int = 320) -> np.ndarray:
    """Keep aspect ratio; downscale so the max dim is at most max_img_sz."""
    im_h, im_w = img.shape[:2]
    if max(im_h, im_w) > max_img_sz:
        ratio = max_img_sz / max(im_h, im_w)
        img = resize_bilinear_np(img, (int(im_h * ratio), int(im_w * ratio)))
    return np.asarray(img, dtype=np.float32)


def image_float_to_uint8(img: np.ndarray) -> np.ndarray:
    """Clamp [0,1] floats and convert to uint8 (reference utils.py:686)."""
    img = np.clip(img, 0.0, 1.0)
    return (img * 255.0).astype(np.uint8)


def crop_and_whiten(img: np.ndarray, mask_occ: np.ndarray, roi) -> tuple:
    """Crop image + occupancy mask to an roi and white-out non-foreground, the
    standard TTO input prep (optimizer_nuscenes.py:592-596).

    img: (H, W, 3) float; mask_occ: (H, W) in {-1, 0, 1}.
    Returns (img_crop (h, w, 3), mask_crop (h, w, 1))."""
    x0, y0, x1, y1 = [int(v) for v in roi]
    img_c = np.asarray(img, np.float32)[y0:y1, x0:x1].copy()
    mask_c = np.asarray(mask_occ, np.float32)[y0:y1, x0:x1][..., None]
    img_c = img_c * (mask_c > 0) + (mask_c <= 0)
    return img_c, mask_c
