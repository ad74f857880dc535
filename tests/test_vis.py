"""KITTI debug-visualization helpers (headless equivalents of the vendored
kitti_object_vis functions the reference imports in src/data_kitti.py:13-14)."""
import numpy as np
import pytest

from supnerf_tpu.data.kitti_format import Calibration, Object3d, read_label
from supnerf_tpu.utils.vis import (
    compute_box_3d,
    draw_projected_box3d,
    show_image_with_boxes,
    show_lidar_on_image,
)

from tests.test_data_kitti import make_kitti_fixture


@pytest.fixture
def kitti_frame(tmp_path):
    make_kitti_fixture(str(tmp_path))
    root = str(tmp_path / "training")
    calib = Calibration(f"{root}/calib/000000.txt")
    objects = read_label(f"{root}/label_2/000000.txt")
    pc = np.fromfile(f"{root}/velodyne/000000.bin", np.float32).reshape(-1, 4)
    from PIL import Image
    img = np.asarray(Image.open(f"{root}/image_2/000000.png"))
    return img, objects, calib, pc


def test_compute_box_3d_projects_into_2d_bbox(kitti_frame):
    img, objects, calib, _ = kitti_frame
    obj = objects[0]
    corners_2d, corners_3d = compute_box_3d(obj, calib.P)
    assert corners_2d.shape == (8, 2) and corners_3d.shape == (8, 3)
    # corners project inside (a small margin of) the label's 2D bbox
    assert corners_2d[:, 0].min() >= obj.xmin - 2
    assert corners_2d[:, 0].max() <= obj.xmax + 2
    assert corners_2d[:, 1].min() >= obj.ymin - 2
    assert corners_2d[:, 1].max() <= obj.ymax + 2
    # bottom ring at y=t[1] (kitti t sits on the ground), top ring at t[1]-h
    np.testing.assert_allclose(corners_3d[:4, 1], obj.t[1], atol=1e-6)
    np.testing.assert_allclose(corners_3d[4:, 1], obj.t[1] - obj.h, atol=1e-6)


def test_compute_box_3d_behind_camera():
    obj = Object3d("Car 0.00 0 0.0 0 0 0 0 1.6 1.9 4.4 0.0 1.6 -5.0 0.0")
    P = np.concatenate([np.eye(3) * 700.0, np.zeros((3, 1))], axis=1)
    corners_2d, corners_3d = compute_box_3d(obj, P)
    assert corners_2d is None and corners_3d.shape == (8, 3)


def test_show_image_with_boxes_draws(kitti_frame):
    img, objects, calib, _ = kitti_frame
    img1, img2 = show_image_with_boxes(img, objects, calib)
    assert img1.shape == img.shape and img2.shape == img.shape
    # green pixels appear where the rect/wireframe was drawn
    green = np.array([0, 255, 0], np.uint8)
    assert (img1 == green).all(-1).any() and (img2 == green).all(-1).any()
    # the non-Car distractor line (occl 3, still type Car) draws; a DontCare
    # object must be skipped entirely
    dc = Object3d("DontCare -1 -1 -10 0 0 50 50 -1 -1 -1 -1000 -1000 -1000 -10")
    a, b = show_image_with_boxes(img, [dc], calib)
    np.testing.assert_array_equal(a, img)
    np.testing.assert_array_equal(b, img)


def test_show_lidar_on_image_splat(kitti_frame):
    img, _, calib, pc = kitti_frame
    out = show_lidar_on_image(pc, img, calib, img.shape[1], img.shape[0])
    assert out.shape == img.shape
    assert (out != img).any()  # points were splatted
    # draws only at the fixture's in-box point projections (car region)
    changed = np.argwhere((out != img).any(-1))
    assert changed[:, 1].min() >= 0 and changed.size > 0


def test_show_lidar_with_boxes_3d_renders(kitti_frame):
    # headless equivalent of the vendored mayavi show_lidar_with_boxes
    # (kitti_object.py:537-607 / viz_util.py:156-393)
    from supnerf_tpu.utils.vis import show_lidar_with_boxes_3d

    img, objects, calib, pc = kitti_frame
    out = show_lidar_with_boxes_3d(pc, objects, calib, fig_size=(4, 3))
    assert out.ndim == 3 and out.shape[2] == 3 and out.dtype == np.uint8
    assert out.std() > 0  # something was drawn

    fov = show_lidar_with_boxes_3d(pc, objects, calib, img_fov=True,
                                   img_width=img.shape[1],
                                   img_height=img.shape[0], fig_size=(4, 3))
    assert fov.shape == out.shape


def test_draw_boxes3d_on_axes_draws_edges():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from supnerf_tpu.utils.vis import draw_boxes3d_on_axes, draw_lidar_3d

    fig = plt.figure(figsize=(3, 3))
    ax = fig.add_subplot(111, projection="3d")
    box = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], np.float64)
    draw_boxes3d_on_axes(ax, [box], label="Car")
    assert len(ax.lines) == 12  # 4 bottom + 4 top + 4 pillars
    draw_lidar_3d(ax, np.random.default_rng(0).normal(size=(100, 4)),
                  color_by="intensity")
    assert len(ax.collections) == 1
    plt.close(fig)


def test_generate_video_vis_assembles_frames(tmp_path):
    """scripts/generate_video_vis.py (reference generate_video_vis.py:1-15):
    a directory of optNNN.png panels becomes one video per object dir —
    mp4 via ffmpeg, or the imageio GIF fallback in ffmpeg-less
    environments like this one."""
    import importlib.util
    import os

    import imageio.v2 as imageio
    import numpy as np

    spec = importlib.util.spec_from_file_location(
        "generate_video_vis",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "generate_video_vis.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    d = tmp_path / "ann0_CAM_FRONT"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        imageio.imwrite(str(d / f"opt{i:03d}.png"),
                        rng.integers(0, 255, (16, 24, 3), dtype=np.uint8))
    (tmp_path / "not_frames").mkdir()     # ignored: no opt*.png inside

    mod.main([str(tmp_path)])

    outs = [p for p in os.listdir(tmp_path)
            if p.startswith("ann0_CAM_FRONT.") and p.split(".")[-1] in
            ("mp4", "gif")]
    assert len(outs) == 1, os.listdir(tmp_path)
    assert (tmp_path / outs[0]).stat().st_size > 0
    assert not any(p.startswith("not_frames.") for p in os.listdir(tmp_path))
