"""Visualization helpers: 3D box wireframes, depth colorization, panel
assembly (equivalents of reference utils.py: render_box :1200,
draw_boxes_train :1240, colorize :1433, align_imgs_width :761 and the
optimizer's save_img3 panel layout :1597-1641)."""
from __future__ import annotations

import numpy as np


def render_box(im: np.ndarray, corners_2d: np.ndarray, colors=((0, 0, 1), (1, 0, 0), (0, 0, 0)),
               linewidth: int = 2) -> np.ndarray:
    """Draw a projected 3D box wireframe. corners_2d: (2or3, 8) with the first
    four corners the front face. Colors: (front, rear, sides)."""
    import cv2

    im = np.ascontiguousarray(im)

    def draw_rect(pts, color):
        prev = pts[-1]
        for corner in pts:
            cv2.line(im, (int(prev[0]), int(prev[1])), (int(corner[0]), int(corner[1])),
                     color, linewidth)
            prev = corner

    c = corners_2d.T
    for i in range(4):
        cv2.line(im, (int(c[i][0]), int(c[i][1])), (int(c[i + 4][0]), int(c[i + 4][1])),
                 tuple(colors[2])[::-1], linewidth)
    draw_rect(c[:4], tuple(colors[0])[::-1])
    draw_rect(c[4:], tuple(colors[1])[::-1])
    # heading tick from the bottom center to the bottom-front center
    cbf = np.mean(c[2:4], axis=0)
    cb = np.mean(c[[2, 3, 7, 6]], axis=0)
    cv2.line(im, (int(cb[0]), int(cb[1])), (int(cbf[0]), int(cbf[1])),
             tuple(colors[0])[::-1], linewidth)
    return im


def colorize_depth(depth: np.ndarray, vmin=None, vmax=None, cmap: str = "magma") -> np.ndarray:
    """Depth map -> uint8 RGB via a matplotlib colormap."""
    import matplotlib.cm

    d = np.asarray(depth, np.float64)
    finite = np.isfinite(d)
    vmin = np.percentile(d[finite], 2) if vmin is None else vmin
    vmax = np.percentile(d[finite], 98) if vmax is None else vmax
    if vmax - vmin < 1e-9:
        vmax = vmin + 1e-9
    norm = np.clip((d - vmin) / (vmax - vmin), 0, 1)
    rgba = matplotlib.cm.get_cmap(cmap)(norm, bytes=True)
    return rgba[..., :3]


def normalize_for_vis(img: np.ndarray) -> np.ndarray:
    """Z-normalize then min-max to [0, 1] (the reference's depth-panel
    normalization, optimizer_nuscenes.py:1607-1609)."""
    img = np.asarray(img, np.float64)
    img = (img - img.mean()) / (img.std() + 1e-9)
    img = img - img.min()
    return img / (img.max() - img.min() + 1e-9)


def panel_rgb_depth_gt(rendered: np.ndarray, depth: np.ndarray, gt: np.ndarray,
                       psnr=None, depth_err=None, rot_err=None, trans_err=None) -> np.ndarray:
    """[rendered | normalized depth | GT] uint8 panel with metric text."""
    import cv2

    H, W = rendered.shape[:2]
    depth_vis = np.repeat(normalize_for_vis(depth)[..., None], 3, axis=-1)
    out = np.zeros((H, 3 * W, 3), np.float32)
    out[:, :W] = np.clip(rendered, 0, 1)
    out[:, W:2 * W] = depth_vis
    out[:, 2 * W:] = np.clip(gt, 0, 1)
    out = (out * 255).astype(np.uint8)
    ratio = H / 128
    if psnr is not None and depth_err is not None:
        cv2.putText(out, f"PSNR: {psnr:.3f},  DE: {depth_err:.3f}",
                    (int(5 * ratio), int(10 * ratio)), cv2.FONT_HERSHEY_SIMPLEX,
                    0.35 * ratio, (0, 0, 0), thickness=max(int(ratio), 1))
    if rot_err is not None and trans_err is not None:
        cv2.putText(out, f"RE: {rot_err:.3f},  TE: {trans_err:.3f}",
                    (int(5 * ratio), int(21 * ratio)), cv2.FONT_HERSHEY_SIMPLEX,
                    0.35 * ratio, (0, 0, 0), thickness=max(int(ratio), 1))
    return out


def virtual_view_sheet(views: np.ndarray) -> np.ndarray:
    """(N, H, W, 3) ring of virtual views -> two-row uint8 sheet (reference
    save_virtual_img :1643-1655)."""
    n, H, W = views.shape[:3]
    half = (n + 1) // 2
    rows = []
    for r in range(2):
        imgs = views[r * half:(r + 1) * half]
        if len(imgs) < half:
            pad = np.ones((half - len(imgs), H, W, 3), views.dtype)
            imgs = np.concatenate([imgs, pad]) if len(imgs) else pad
        rows.append(np.concatenate(list(imgs), axis=1))
    sheet = np.concatenate(rows, axis=0)
    return (np.clip(sheet, 0, 1) * 255).astype(np.uint8)
