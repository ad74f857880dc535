"""KITTI data-layer tests over a generated on-disk KITTI-format fixture."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from supnerf_tpu.data import common
from supnerf_tpu.data.kitti import KittiData, _corners_kitti_np, _kitti_obj_pose
from supnerf_tpu.data.kitti_format import (
    Calibration,
    KittiObjectDataset,
    Object3d,
    get_lidar_in_image_fov,
    read_label,
)

K = np.array([[700.0, 0, 600, 40.0], [0, 700, 180, 2.0], [0, 0, 1, 0.0]])


def make_kitti_fixture(root, n_frames=2, img_w=1200, img_h=370):
    """Generate calib/label_2/image_2/velodyne/pred_instance files for a tiny
    synthetic KITTI training split."""
    rng = np.random.default_rng(0)
    tr = os.path.join(root, "training")
    for d in ["calib", "label_2", "image_2", "velodyne", "pred_instance", "pred"]:
        os.makedirs(os.path.join(tr, d), exist_ok=True)
    os.makedirs(os.path.join(root, "ImageSets"), exist_ok=True)

    # velo->cam: velo x-front,y-left,z-up -> cam x-right,y-down,z-front
    V2C = np.array([[0.0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0]])
    R0 = np.eye(3)
    ids = []
    for f in range(n_frames):
        idx = "%06d" % f
        ids.append(idx)
        with open(os.path.join(tr, "calib", idx + ".txt"), "w") as fh:
            for pname in ["P0", "P1", "P2", "P3"]:
                fh.write(f"{pname}: " + " ".join(str(v) for v in K.reshape(-1)) + "\n")
            fh.write("R0_rect: " + " ".join(str(v) for v in R0.reshape(-1)) + "\n")
            fh.write("Tr_velo_to_cam: " + " ".join(str(v) for v in V2C.reshape(-1)) + "\n")

        # one car at depth 15, centered-ish
        t = np.array([0.5, 1.6, 15.0])  # kitti t is on the ground
        h, w, l = 1.6, 1.9, 4.4
        ry = 0.3
        obj_pose = _kitti_obj_pose(
            Object3d(f"Car 0.00 0 0.0 0 0 0 0 {h} {w} {l} {t[0]} {t[1]} {t[2]} {ry}"),
            K[:, :3], K)
        corners = _corners_kitti_np(obj_pose, np.array([w, l, h]))
        uv = K[:, :3] @ corners
        uv = uv[:2] / uv[2:3]
        x0, y0 = uv.min(axis=1)
        x1, y1 = uv.max(axis=1)
        with open(os.path.join(tr, "label_2", idx + ".txt"), "w") as fh:
            fh.write(f"Car 0.00 0 0.0 {x0:.2f} {y0:.2f} {x1:.2f} {y1:.2f} "
                     f"{h} {w} {l} {t[0]} {t[1]} {t[2]} {ry}\n")
            # a distractor that must be filtered (occlusion 3)
            fh.write(f"Car 0.00 3 0.0 10 10 40 40 {h} {w} {l} -20 1.6 60 0\n")
        with open(os.path.join(tr, "pred", idx + ".txt"), "w") as fh:
            fh.write(f"Car 0.00 0 0.0 {x0:.2f} {y0:.2f} {x1:.2f} {y1:.2f} "
                     f"{h} {w} {l} {t[0] + 0.3} {t[1]} {t[2] + 0.5} {ry + 0.1} 0.9\n")

        img = np.full((img_h, img_w, 3), 255, np.uint8)
        mask = np.zeros((img_h, img_w), np.uint8)
        xi0, yi0 = max(int(x0), 0), max(int(y0), 0)
        xi1, yi1 = min(int(x1), img_w - 1), min(int(y1), img_h - 1)
        mask[yi0:yi1, xi0:xi1] = 255
        img[mask > 0] = (180, 30, 30)
        Image.fromarray(img).save(os.path.join(tr, "image_2", idx + ".png"))

        # lidar points inside the box (object frame), mapped cam -> velo
        n_pts = 80
        local = np.stack([
            rng.uniform(-0.4 * l, 0.4 * l, n_pts),
            rng.uniform(-0.85 * h, -0.2 * h, n_pts),
            rng.uniform(-0.4 * w, 0.4 * w, n_pts),
        ], axis=1)
        cam_pts = local @ obj_pose[:, :3].T + obj_pose[:, 3]
        velo = np.stack([cam_pts[:, 2], -cam_pts[:, 0], -cam_pts[:, 1]], axis=1)
        pc = np.concatenate([velo, np.ones((n_pts, 1))], axis=1).astype(np.float32)
        pc.tofile(os.path.join(tr, "velodyne", idx + ".bin"))

        preds = {"labels": ["car"], "boxes": [[float(x0), float(y0), float(x1), float(y1)]]}
        with open(os.path.join(tr, "pred_instance", idx + ".json"), "w") as fh:
            json.dump(preds, fh)
        Image.fromarray(mask).save(os.path.join(tr, "pred_instance", idx + "_0.png"))

    with open(os.path.join(root, "ImageSets", "val.txt"), "w") as fh:
        fh.write("\n".join(ids) + "\n")
    return ids


HPAMS = {"dataset": {"kitti_cat": "Car", "seg_cat": "car", "box_iou_th": 0.5,
                     "max_dist": 40, "min_depth": 3, "min_lidar_cnt": 10,
                     "mask_pixels": 500, "divisor": 1000}}


@pytest.fixture
def kitti_root(tmp_path):
    make_kitti_fixture(str(tmp_path))
    HPAMS["dataset"]["data_dir"] = str(tmp_path)
    HPAMS["dataset"]["split_dir"] = str(tmp_path / "ImageSets")
    return str(tmp_path)


def test_calibration_projection_roundtrip(kitti_root):
    calib = KittiObjectDataset(kitti_root, "training").get_calibration(0)
    pts_velo = np.array([[10.0, 1.0, -0.5]])
    rect = calib.project_velo_to_rect(pts_velo)
    np.testing.assert_allclose(rect[0], [-1.0, 0.5, 10.0], atol=1e-6)
    uv = calib.project_rect_to_image(rect)
    assert (0 <= uv[0, 0] < 1200) and (0 <= uv[0, 1] < 370)
    back = calib.project_image_to_rect(np.concatenate([uv, rect[:, 2:3]], axis=1))
    np.testing.assert_allclose(back, rect, atol=1e-4)


def test_object3d_parse_roundtrip():
    line = "Car 0.00 1 -1.58 587.01 173.33 614.12 200.12 1.65 1.67 3.64 -0.65 1.71 46.70 -1.59"
    o = Object3d(line)
    assert o.type == "Car" and o.occlusion == 1
    assert o.h == 1.65 and o.w == 1.67 and o.l == 3.64
    o2 = Object3d(o.to_kitti_line())
    np.testing.assert_allclose(o2.box2d, o.box2d)
    assert o2.ry == pytest.approx(o.ry, abs=0.01)


def test_lidar_fov_selection(kitti_root):
    loader = KittiObjectDataset(kitti_root, "training")
    pc = loader.get_lidar(0)[:, :3]
    calib = loader.get_calibration(0)
    fov_pc, pts2d, inds = get_lidar_in_image_fov(pc, calib, 0, 0, 1200, 370, True)
    assert inds.sum() == 80  # all fixture points project into the image
    uv = pts2d[inds]
    assert (uv[:, 0] >= 0).all() and (uv[:, 0] < 1200).all()


def test_kitti_dataset_curation_and_sample(kitti_root):
    ds = KittiData(HPAMS, split="val", add_pose_err=2)
    assert len(ds) == 2  # one valid car per frame; occluded distractor filtered
    s = ds[0]
    assert s["imgs"].shape == (370, 1200, 3)
    assert set(np.unique(s["masks_occ"])).issubset({-1.0, 0.0, 1.0})
    assert s["wlh"] == pytest.approx([1.9, 4.4, 1.6])
    # pose init mode 2 is a random kitti-frame pose at depth 20
    assert s["obj_poses_w_err"][2, 3] == pytest.approx(20.0, abs=1e-3)
    # lidar pixels all on the mask with depths inside the box's z extent
    assert len(s["lidar_u"]) > 50
    assert (s["lidar_depth"] > 13.0).all() and (s["lidar_depth"] < 17.0).all()
    # index file reused on second construction
    ds2 = KittiData(HPAMS, split="val", add_pose_err=0)
    assert ds2.all_valid_samples == ds.all_valid_samples
    s0 = ds2[0]
    np.testing.assert_allclose(s0["obj_poses_w_err"], s0["obj_poses"])


def test_kitti_third_party_detection_mode(kitti_root):
    ds = KittiData(HPAMS, split="val", add_pose_err=3)
    s = ds[0]
    # mode 3 pulls the pred/ file pose: depth differs from GT by +0.5
    assert s["obj_poses_w_err"][2, 3] == pytest.approx(
        s["obj_poses"][2, 3] + 0.5, abs=0.05)


def test_waymo_layout(tmp_path):
    """Waymo reuses the loader with image/label dirs."""
    make_kitti_fixture(str(tmp_path))
    tr = tmp_path / "training"
    (tr / "image_2").rename(tr / "image")
    (tr / "label_2").rename(tr / "label")
    hp = {"dataset": dict(HPAMS["dataset"])}
    hp["dataset"]["waymo_cat"] = "Car"
    hp["dataset"]["data_dir"] = str(tmp_path)
    hp["dataset"]["split_dir"] = str(tmp_path / "ImageSets")
    from supnerf_tpu.data.waymo import WaymoData

    ds = WaymoData(hp, split="val", add_pose_err=0)
    assert len(ds) == 2
    assert ds[0]["cam_ids"] == "CAM_FRONT"


def test_common_helpers():
    assert common.box_iou_xyxy([0, 0, 10, 10], [5, 0, 15, 10]) == pytest.approx(1 / 3)
    assert common.box_iou_xyxy([0, 0, 1, 1], [2, 2, 3, 3]) == 0.0
    masks = [np.zeros((4, 4)), np.zeros((4, 4))]
    masks[0][1:3, 1:3] = 1
    masks[1][0, 0] = 1
    occ = common.get_mask_occ_from_ins(masks, 0)
    assert occ[1, 1] == 1 and occ[0, 0] == 0 and occ[3, 3] == -1


def test_debug_panel_and_statistics(kitti_root, tmp_path):
    """Dataset QA parity (reference data_kitti.py debug rendering + __main__
    stats blocks :606-665): debug=True writes a per-sample overlay panel, and
    dataset_statistics produces wlh/dist stats and an occlusion histogram."""
    from supnerf_tpu.data.debug import dataset_statistics

    dbg_dir = str(tmp_path / "dbg")
    ds = KittiData(HPAMS, split="val", add_pose_err=1, debug=True,
                   debug_dir=dbg_dir)
    s = ds[0]
    assert s["occlusion"] == 0.0
    panels = os.listdir(dbg_dir)
    assert len(panels) == 1 and panels[0].endswith(".png")
    import imageio.v2 as imageio

    panel = imageio.imread(os.path.join(dbg_dir, panels[0]))
    assert panel.shape == (370, 2400, 3)     # [image | mask] side by side
    # the error box (add_pose_err=1) draws red pixels the GT-only panel lacks
    assert (panel[..., 0].astype(int) - panel[..., 1].astype(int) > 120).any()

    ds.debug = False
    stats_dir = str(tmp_path / "stats")
    stats = dataset_statistics(ds, stats_dir, print_every=0)
    assert stats["n_samples"] == 2
    assert stats["level_label"] == "Occlusion"
    np.testing.assert_allclose(stats["wlh_mean"], [1.9, 4.4, 1.6], atol=1e-5)
    assert stats["dist_mean"] == pytest.approx(np.linalg.norm([0.5, 0.8, 15.0]),
                                               rel=0.1)
    files = set(os.listdir(stats_dir))
    assert "kitti_dist_hist.pdf" in files and "kitti_occ_hist.pdf" in files
