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

# --------------------------------------------------------------------------
# KITTI debug visualization (headless equivalents of the vendored
# kitti_object_vis helpers the reference imports in src/data_kitti.py:13-14:
# compute_box_3d (kitti_util.py:601), show_image_with_boxes
# (kitti_object.py:186), show_lidar_on_image (kitti_object.py:676). The
# mayavi 3D window is intentionally not reproduced; these return images.
# --------------------------------------------------------------------------

# 2D box colors per KITTI category (kitti_object.py:196-217)
_KITTI_BOX_COLORS = {"Car": (0, 255, 0), "Pedestrian": (255, 255, 0),
                     "Cyclist": (0, 255, 255)}


def compute_box_3d(obj, P: np.ndarray):
    """Project a KITTI label-frame 3D box into the image plane
    (kitti_util.py:601-637 convention: yaw about +y, t at the bottom-face
    center, y down so the top ring sits at y=-h).

    Returns (corners_2d (8, 2) or None if any corner is behind the camera,
    corners_3d (8, 3) in rect camera coords)."""
    c, s = np.cos(obj.ry), np.sin(obj.ry)
    R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    l, w, h = obj.l, obj.w, obj.h
    x = np.array([l, l, -l, -l, l, l, -l, -l]) / 2.0
    y = np.array([0, 0, 0, 0, -h, -h, -h, -h], np.float64)
    z = np.array([w, -w, -w, w, w, -w, -w, w]) / 2.0
    corners_3d = (R @ np.vstack([x, y, z])).T + np.asarray(obj.t)
    if np.any(corners_3d[:, 2] < 0.1):
        return None, corners_3d
    uvw = corners_3d @ np.asarray(P)[:3, :3].T + np.asarray(P)[:3, 3]
    return uvw[:, :2] / uvw[:, 2:3], corners_3d


def draw_projected_box3d(image: np.ndarray, qs: np.ndarray,
                         color=(0, 255, 0), thickness: int = 2) -> np.ndarray:
    """Wireframe of a projected box: bottom ring (0-3), top ring (4-7),
    pillars (kitti_util.py draw_projected_box3d semantics)."""
    import cv2

    image = np.ascontiguousarray(image)
    qs = qs.astype(np.int32)
    for k in range(4):
        i, j = k, (k + 1) % 4
        cv2.line(image, tuple(qs[i]), tuple(qs[j]), color, thickness)
        i, j = k + 4, (k + 1) % 4 + 4
        cv2.line(image, tuple(qs[i]), tuple(qs[j]), color, thickness)
        cv2.line(image, tuple(qs[k]), tuple(qs[k + 4]), color, thickness)
    return image


def show_image_with_boxes(img: np.ndarray, objects, calib, show3d: bool = True):
    """(img with 2D rects, img with projected 3D wireframes) for a KITTI
    frame's labels (kitti_object.py:186-249, minus the cv2.imshow side
    effects). objects: data.kitti_format.Object3d list; calib provides .P."""
    import cv2

    img1, img2 = np.copy(img), np.copy(img)
    for obj in objects:
        color = _KITTI_BOX_COLORS.get(obj.type)
        if color is None:  # DontCare / other categories are skipped
            continue
        cv2.rectangle(img1, (int(obj.xmin), int(obj.ymin)),
                      (int(obj.xmax), int(obj.ymax)), color, 2)
        if show3d:
            box3d_pts_2d, _ = compute_box_3d(obj, calib.P)
            if box3d_pts_2d is not None:
                img2 = draw_projected_box3d(img2, box3d_pts_2d, color=color)
    return img1, img2


def show_lidar_on_image(pc_velo: np.ndarray, img: np.ndarray, calib,
                        img_width: int, img_height: int) -> np.ndarray:
    """Splat lidar returns onto the image, hsv-colored by 640/depth
    (kitti_object.py:676-700, returning the image instead of cv2.imshow)."""
    import cv2
    import matplotlib.pyplot as plt

    from supnerf_tpu.data.kitti_format import get_lidar_in_image_fov

    img = np.copy(img)
    pc_velo = np.asarray(pc_velo)[:, :3]
    _, pts_2d, fov_inds = get_lidar_in_image_fov(
        pc_velo, calib, 0, 0, img_width, img_height, return_more=True)
    imgfov_pts_2d = pts_2d[fov_inds, :]
    imgfov_pc_rect = calib.project_velo_to_rect(pc_velo[fov_inds])
    cmap = (np.asarray(plt.get_cmap("hsv")(np.linspace(0, 1, 256)))[:, :3]
            * 255)
    for i in range(imgfov_pts_2d.shape[0]):
        depth = max(float(imgfov_pc_rect[i, 2]), 1e-3)
        color = cmap[int(np.clip(640.0 / depth, 0, 255)), :]
        cv2.circle(img, (int(np.round(imgfov_pts_2d[i, 0])),
                         int(np.round(imgfov_pts_2d[i, 1]))),
                   2, color=tuple(color), thickness=-1)
    return img

def draw_lidar_3d(ax, pc: np.ndarray, color_by: str = "depth",
                  pts_color=None, max_pts: int = 50000, s: float = 0.5):
    """Scatter a lidar cloud onto a matplotlib 3D axes (headless equivalent
    of the vendored mayavi viz_util.draw_lidar, kitti_object_vis/viz_util.py
    :156-317 — same gnuplot colormap, color-by-height default replaced by an
    explicit color_by selector). pc: (N, >=3); color_by: 'depth' (distance
    from origin), 'height' (z, the mayavi default), 'intensity' (column 3),
    or None with pts_color an RGB tuple."""
    pc = np.asarray(pc)
    if pc.shape[0] > max_pts:            # decimate huge clouds for plotting
        pc = pc[:: pc.shape[0] // max_pts + 1]
    if pts_color is not None or color_by is None:
        ax.scatter(pc[:, 0], pc[:, 1], pc[:, 2], c=[pts_color or (1, 1, 1)],
                   s=s, depthshade=False)
        return
    if color_by == "height":
        c = pc[:, 2]
    elif color_by == "intensity" and pc.shape[1] > 3:
        c = pc[:, 3]
    else:
        c = np.linalg.norm(pc[:, :3], axis=1)
    ax.scatter(pc[:, 0], pc[:, 1], pc[:, 2], c=c, cmap="gnuplot", s=s,
               depthshade=False)


def draw_boxes3d_on_axes(ax, boxes3d, color=(0, 1, 0), label: str = "",
                         linewidth: float = 1.0):
    """Wireframe 3D boxes on a matplotlib 3D axes (viz_util.draw_gt_boxes3d
    :319-393 semantics: bottom ring 0-3, top ring 4-7, pillars; optional
    label text at corner 4). boxes3d: iterable of (8, 3) corner arrays."""
    for b in boxes3d:
        b = np.asarray(b)
        for k in range(4):
            for i, j in ((k, (k + 1) % 4), (k + 4, (k + 1) % 4 + 4),
                         (k, k + 4)):
                ax.plot([b[i, 0], b[j, 0]], [b[i, 1], b[j, 1]],
                        [b[i, 2], b[j, 2]], color=color, linewidth=linewidth)
        if label:
            ax.text(b[4, 0], b[4, 1], b[4, 2], label, color=color, fontsize=7)


def show_lidar_with_boxes_3d(pc_velo: np.ndarray, objects, calib,
                             img_fov: bool = False, img_width: int = 0,
                             img_height: int = 0, fig_size=(12, 8),
                             elev: float = 20.0, azim: float = 180.0):
    """Render the 3D lidar+boxes debug view to an RGB array (headless
    equivalent of kitti_object.show_lidar_with_boxes :537-607, which drives
    the vendored mayavi viz_util; mayavi is interactive-only and absent from
    this image). The scene is displayed in the velodyne-style frame the mayavi
    view used (x forward, y left, z up); boxes come from compute_box_3d in
    rect-camera coords and are remapped (x,y,z)_rect -> (z, -x, -y)_display.
    objects: data.kitti_format.Object3d list; calib: Calibration."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    def rect_to_display(p):
        return np.stack([p[:, 2], -p[:, 0], -p[:, 1]], 1)

    pc_velo = np.asarray(pc_velo)
    if img_fov:
        from supnerf_tpu.data.kitti_format import get_lidar_in_image_fov

        pc_velo = get_lidar_in_image_fov(pc_velo[:, :3], calib, 0, 0,
                                         img_width, img_height)
    pc_rect = calib.project_velo_to_rect(pc_velo[:, :3])
    fig = plt.figure(figsize=fig_size)
    ax = fig.add_subplot(111, projection="3d")
    ax.set_facecolor("black")
    draw_lidar_3d(ax, rect_to_display(pc_rect))
    for obj in objects:
        if obj.type == "DontCare":
            continue
        _, corners_3d = compute_box_3d(obj, calib.P)
        draw_boxes3d_on_axes(ax, [rect_to_display(corners_3d)],
                             color=tuple(np.asarray(_KITTI_BOX_COLORS.get(
                                 obj.type, (0, 255, 0))) / 255.0),
                             label=obj.type)
    ax.set_xlabel("x (forward, m)")
    ax.set_ylabel("y (left, m)")
    ax.set_zlabel("z (up, m)")
    # equal data aspect (mayavi's default) — matplotlib 3D otherwise scales
    # each axis independently and stretches the scene
    spans = np.array([np.ptp(lim) for lim in
                      (ax.get_xlim(), ax.get_ylim(), ax.get_zlim())])
    ax.set_box_aspect(np.maximum(spans, 1e-3))
    ax.view_init(elev=elev, azim=azim)
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return buf
