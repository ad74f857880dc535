"""Golden tests for the Waymo->KITTI converter's pure calibration/label math
(mirrors /root/reference/data/Waymo/converter.py:166-266 save_calib and
:345-496 save_label). TFRecord parsing itself cannot run here (tensorflow /
waymo_open_dataset absent) but the geometry is proven against hand-derived
matrices.
"""
import numpy as np
import pytest

from supnerf_tpu.data.waymo_converter import (
    T_FRONT_CAM_TO_REF,
    front_calib_matrices,
    label_box_to_kitti,
    projected_box2d,
)


def _homo(R=np.eye(3), t=(0.0, 0.0, 0.0)):
    out = np.eye(4)
    out[:3, :3] = R
    out[:3, 3] = t
    return out


def test_axes_map_front_left_up_to_right_down_front():
    # waymo camera frame: x front, y left, z up -> KITTI: x right, y down,
    # z front. A point 10 m ahead, 2 m to the left, 1 m up.
    p = np.array([10.0, 2.0, 1.0])
    cam = T_FRONT_CAM_TO_REF @ p
    np.testing.assert_allclose(cam, [-2.0, -1.0, 10.0])
    # the map is a rotation (proper orthonormal)
    np.testing.assert_allclose(T_FRONT_CAM_TO_REF @ T_FRONT_CAM_TO_REF.T, np.eye(3),
                               atol=1e-12)
    assert np.isclose(np.linalg.det(T_FRONT_CAM_TO_REF), 1.0)


def test_calib_identity_extrinsic():
    P2, R0, Tr = front_calib_matrices(np.eye(4), [2055.5, 2055.5, 960.0, 640.0])
    np.testing.assert_allclose(
        P2, [[2055.5, 0, 960.0, 0], [0, 2055.5, 640.0, 0], [0, 0, 1, 0]])
    np.testing.assert_allclose(R0, np.eye(3))
    # with camera frame == vehicle frame, Tr is exactly the axes permutation
    np.testing.assert_allclose(Tr[:, :3], T_FRONT_CAM_TO_REF)
    np.testing.assert_allclose(Tr[:, 3], 0.0)


def test_calib_translated_extrinsic():
    # camera mounted 1.5 m forward, 0.2 m left, 1.8 m up of the vehicle
    # origin, axes aligned: a vehicle point is first shifted by -t, then
    # axis-permuted.
    t = np.array([1.5, 0.2, 1.8])
    _, _, Tr = front_calib_matrices(_homo(t=t), [100.0, 100.0, 50.0, 50.0])
    p = np.array([11.5, 0.2, 1.8, 1.0])  # 10 m straight ahead of the camera
    np.testing.assert_allclose(Tr @ p, [0.0, 0.0, 10.0], atol=1e-12)
    # hand-derived matrix: T_ref @ [[I, -t], [0, 1]]
    expect = np.hstack([T_FRONT_CAM_TO_REF, (T_FRONT_CAM_TO_REF @ -t)[:, None]])
    np.testing.assert_allclose(Tr, expect, atol=1e-12)


def test_calib_rotated_extrinsic():
    # camera yawed 90 deg left (looks along vehicle +y)
    c, s = 0.0, 1.0
    Rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    _, _, Tr = front_calib_matrices(_homo(R=Rz), [100.0, 100.0, 50.0, 50.0])
    # a vehicle point 10 m to the left is straight ahead of this camera
    np.testing.assert_allclose(Tr @ [0.0, 10.0, 0.0, 1.0], [0.0, 0.0, 10.0],
                               atol=1e-12)
    # a point ahead of the vehicle appears to the camera's right (+x KITTI)
    np.testing.assert_allclose(Tr @ [10.0, 0.0, 0.0, 1.0], [10.0, 0.0, 0.0],
                               atol=1e-12)


def test_label_center_heading_alpha():
    _, _, Tr = front_calib_matrices(np.eye(4), [100.0, 100.0, 50.0, 50.0])
    # box facing vehicle +x (heading 0), volumetric center 10 m ahead at 1 m
    # height, 2 m tall -> bottom center on the ground
    center_cam, ry, alpha = label_box_to_kitti((10.0, 0.0, 1.0), 2.0, 0.0, Tr)
    np.testing.assert_allclose(center_cam, [0.0, 0.0, 10.0], atol=1e-12)
    assert np.isclose(ry, -np.pi / 2)
    # straight ahead: alpha == rotation_y (reference writes alpha=-10; we
    # compute the KITTI devkit definition ry - atan2(x, z))
    assert np.isclose(alpha, -np.pi / 2)


@pytest.mark.parametrize("heading,expected_ry", [
    (0.0, -np.pi / 2),
    (np.pi / 2, -np.pi),       # facing vehicle left -> KITTI yaw pi (wrapped)
    (-np.pi / 2, 0.0),         # facing vehicle right -> KITTI yaw 0
    (np.pi, np.pi / 2),        # unwrapped -3pi/2 wraps into [-pi, pi)
])
def test_label_rotation_wrap(heading, expected_ry):
    _, _, Tr = front_calib_matrices(np.eye(4), [100.0, 100.0, 50.0, 50.0])
    _, ry, _ = label_box_to_kitti((10.0, 0.0, 1.0), 2.0, heading, Tr)
    assert np.isclose((ry - expected_ry + np.pi) % (2 * np.pi) - np.pi, 0.0,
                      atol=1e-12)
    assert -np.pi <= ry < np.pi


def test_label_offset_object_alpha():
    # object 10 m ahead and 5 m left of an identity-mounted camera
    _, _, Tr = front_calib_matrices(np.eye(4), [100.0, 100.0, 50.0, 50.0])
    center_cam, ry, alpha = label_box_to_kitti((10.0, 5.0, 1.0), 2.0, 0.0, Tr)
    np.testing.assert_allclose(center_cam, [-5.0, 0.0, 10.0], atol=1e-12)
    assert np.isclose(alpha, ry - np.arctan2(-5.0, 10.0))


def test_projected_box2d():
    assert projected_box2d(100.0, 50.0, 40.0, 20.0) == (80.0, 40.0, 120.0, 60.0)


def test_tr_matches_kitti_calibration_reader(tmp_path):
    """The written Tr_velo_to_cam must round-trip through the KITTI-format
    Calibration reader used by the data layer."""
    from supnerf_tpu.data.kitti_format import Calibration

    rng = np.random.default_rng(0)
    # random valid extrinsic: orthonormal R + translation
    q = rng.normal(size=(3, 3))
    R, _ = np.linalg.qr(q)
    if np.linalg.det(R) < 0:
        R[:, 0] *= -1
    ext = _homo(R=R, t=rng.normal(size=3))
    P2, R0, Tr = front_calib_matrices(ext, [2000.0, 2000.0, 960.0, 640.0])
    lines = []
    for pname in ["P0", "P1", "P2", "P3"]:
        lines.append(f"{pname}: " + " ".join(f"{v:e}" for v in P2.reshape(-1)))
    lines.append("R0_rect: " + " ".join(f"{v:e}" for v in np.eye(3).reshape(-1)))
    lines.append("Tr_velo_to_cam: " + " ".join(f"{v:e}" for v in Tr.reshape(-1)))
    f = tmp_path / "000000.txt"
    f.write_text("\n".join(lines) + "\n")
    calib = Calibration(str(f))
    np.testing.assert_allclose(calib.V2C, Tr, rtol=1e-6)
    np.testing.assert_allclose(calib.P, P2, rtol=1e-6)


# ---------------------------------------------------------- frame path ------
class _NS:
    """Tiny attribute bag for fake waymo protos."""

    def __init__(self, **kw):
        self.__dict__.update(kw)


def _fake_frame():
    """A duck-typed waymo Frame covering the non-lidar writers
    (reference data/Waymo/converter.py:119-266 consumes exactly these
    attributes)."""
    import io

    import numpy as np
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(
        (np.linspace(0, 255, 8 * 12 * 3).reshape(8, 12, 3)).astype(np.uint8)
    ).save(buf, format="JPEG")

    # front cam extrinsic: camera 2 m forward, 1.5 m up in the vehicle frame
    extrinsic = np.eye(4)
    extrinsic[:3, 3] = [2.0, 0.0, 1.5]
    calib = _NS(name=1, extrinsic=_NS(transform=list(extrinsic.reshape(-1))),
                intrinsic=[2000.0, 2010.0, 960.0, 640.0, 0, 0, 0, 0, 0])

    box3d = _NS(center_x=10.0, center_y=-1.0, center_z=1.0,
                length=4.5, width=1.9, height=1.6, heading=0.3)
    laser_label = _NS(id="obj1", type=1, box=box3d)          # TYPE_VEHICLE
    ped_label = _NS(id="obj2", type=2,                        # no projection
                    box=_NS(center_x=5.0, center_y=3.0, center_z=1.0,
                            length=0.8, width=0.8, height=1.8, heading=0.0))
    proj_box = _NS(center_x=600.0, center_y=400.0, length=120.0, width=80.0)
    proj = _NS(name=1, labels=[_NS(id="obj1_FRONT", box=proj_box)])

    pose = np.eye(4)
    pose[:3, 3] = [100.0, 50.0, 0.0]
    return _NS(images=[_NS(name=1, image=buf.getvalue())],
               context=_NS(camera_calibrations=[calib]),
               projected_lidar_labels=[proj],
               laser_labels=[laser_label, ped_label],
               pose=_NS(transform=list(pose.reshape(-1))))


def test_convert_frame_writers_with_fake_frame(tmp_path):
    """convert_frame (minus lidar) runs on a duck-typed frame and the outputs
    parse through the KITTI-format readers with the expected math."""
    import numpy as np

    from supnerf_tpu.data.kitti_format import Calibration, read_label
    from supnerf_tpu.data.waymo_converter import (
        WaymoToKITTI,
        front_calib_matrices,
        label_box_to_kitti,
    )

    (tmp_path / "raw").mkdir()
    conv = WaymoToKITTI(str(tmp_path / "raw"), str(tmp_path / "out"))
    frame = _fake_frame()
    conv.convert_frame(frame, "000000", with_lidar=False)

    out = tmp_path / "out" / "training"
    assert (out / "image" / "000000.png").exists()
    assert (out / "pose" / "000000.txt").exists()

    # calib parses and matches the pure-math golden
    cal = Calibration(str(out / "calib" / "000000.txt"))
    extrinsic = np.array(frame.context.camera_calibrations[0].extrinsic.transform).reshape(4, 4)
    P2, _, Tr = front_calib_matrices(extrinsic, frame.context.camera_calibrations[0].intrinsic)
    np.testing.assert_allclose(cal.P, P2, rtol=1e-6)
    np.testing.assert_allclose(cal.V2C, Tr, rtol=1e-6)

    # label: only the projected vehicle makes it through, fields match
    objs = read_label(str(out / "label" / "000000.txt"))
    assert len(objs) == 1 and objs[0].type == "Car"
    center, ry, alpha = label_box_to_kitti(
        (10.0, -1.0, 1.0), 1.6, 0.3, Tr)
    np.testing.assert_allclose(objs[0].t, center, atol=5e-3)
    np.testing.assert_allclose(objs[0].ry, ry, atol=5e-3)
    np.testing.assert_allclose([objs[0].h, objs[0].w, objs[0].l],
                               [1.6, 1.9, 4.5], atol=1e-6)
    np.testing.assert_allclose(
        [objs[0].xmin, objs[0].ymin, objs[0].xmax, objs[0].ymax],
        [540.0, 360.0, 660.0, 440.0], atol=1e-2)

    # pose round-trips
    pose = np.loadtxt(out / "pose" / "000000.txt")
    np.testing.assert_allclose(
        pose, np.array(frame.pose.transform).reshape(4, 4), rtol=1e-6)


def test_setup_split_renumbers_and_links(tmp_path):
    """setup_split mirrors the reference renumbering semantics
    (data/Waymo/setup_split.py): sequential ids, missing entries skipped but
    still consuming an id, split file listing only linked ids."""
    import numpy as np

    from supnerf_tpu.data.waymo_converter import setup_split

    org = tmp_path / "validation_org"
    for seg, fid in [("seg-a", "000000"), ("seg-a", "000001"),
                     ("seg-b", "000000")]:
        for sub, ext, content in [("calib", ".txt", "P2: 1 0 0 0\n"),
                                  ("image_0", ".png", "fakepng"),
                                  ("label_0", ".txt", "Car 0 0 0\n"),
                                  ("velodyne", ".bin", "\x00\x00")]:
            d = org / seg / sub
            d.mkdir(parents=True, exist_ok=True)
            (d / (fid + ext)).write_text(content)
    # remove one required file -> that entry must be skipped but use an id
    (org / "seg-a" / "label_0" / "000001.txt").unlink()

    split_list = tmp_path / "val_org.txt"
    split_list.write_text("seg-a 000000\nseg-a 000001\nseg-b 000000\n")
    out_split = tmp_path / "val.txt"

    linked = setup_split(str(tmp_path), str(org), str(split_list),
                         str(out_split), symlink=True)
    assert linked == ["000000", "000002"]  # 000001 consumed by the skip
    assert out_split.read_text().split() == ["000000", "000002"]
    tr = tmp_path / "training"
    assert (tr / "image" / "000000.png").is_symlink()
    assert (tr / "velodyne" / "000002.bin").exists()
    assert not (tr / "calib" / "000001.txt").exists()
    # linked content resolves to the right segment's file
    assert (tr / "label" / "000002.txt").read_text() == "Car 0 0 0\n"


def test_converter_cli_setup_split(tmp_path):
    """The module's script CLI (python -m supnerf_tpu.data.waymo_converter
    setup-split ...) drives setup_split like the reference's standalone
    setup_split.py script."""
    from supnerf_tpu.data.waymo_converter import main

    org = tmp_path / "validation_org"
    for sub, ext, content in [("calib", ".txt", "P2: 1 0 0 0\n"),
                              ("image_0", ".png", "fakepng"),
                              ("label_0", ".txt", "Car 0 0 0\n"),
                              ("velodyne", ".bin", "x")]:
        d = org / "seg-a" / sub
        d.mkdir(parents=True, exist_ok=True)
        (d / ("000000" + ext)).write_text(content)
    split_list = tmp_path / "val_org.txt"
    split_list.write_text("seg-a 000000\n")
    out_split = tmp_path / "val.txt"
    main(["setup-split", str(tmp_path), str(org), str(split_list),
          str(out_split), "--copy"])
    tr = tmp_path / "training"
    assert (tr / "image" / "000000.png").exists()
    assert not (tr / "image" / "000000.png").is_symlink()
    assert out_split.read_text().split() == ["000000"]
