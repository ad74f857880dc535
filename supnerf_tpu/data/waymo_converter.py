"""Waymo Open Dataset -> KITTI-format converter (front camera).

Capability-equivalent of the reference converter
(/root/reference/data/Waymo/converter.py WaymoToKITTI :58 — multiprocess
TFRecord conversion writing image/calib/label/velodyne/pose files — and
setup_split.py :1-190 building val/val_small split symlinks).

Requires tensorflow + waymo_open_dataset (not installed in the build image;
imports are gated so the module always loads). Output layout matches
supnerf_tpu.data.waymo.WaymoData (layout='waymo': image/ label/ calib/
velodyne/ under <out_dir>/training).
"""
from __future__ import annotations

import os
from multiprocessing import Pool

import numpy as np

# Waymo laser name order used for concatenated range images
_T_FRONT_CAM = 1  # waymo camera_name FRONT


def _require_waymo():
    try:
        import tensorflow  # noqa: F401
        from waymo_open_dataset import dataset_pb2  # noqa: F401
        from waymo_open_dataset.utils import frame_utils  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "waymo_open_dataset (and tensorflow) are required for conversion; "
            "install them in an environment with network access."
        ) from e


def _cart_to_homo(mat):
    out = np.eye(4)
    out[: mat.shape[0], : mat.shape[1]] = mat
    return out


# Waymo front camera frame is (x front, y left, z up); the KITTI reference
# camera frame is (x right, y down, z front). T_FRONT_CAM_TO_REF maps the
# former to the latter (reference data/Waymo/converter.py:205-214).
T_FRONT_CAM_TO_REF = np.array(
    [[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])


def front_calib_matrices(extrinsic: np.ndarray, intrinsic) -> tuple:
    """KITTI calib entries for the waymo front camera (pure math; reference
    converter.py:166-266).

    extrinsic: (4, 4) T_front_cam_to_vehicle from the camera calibration proto.
    intrinsic: sequence whose first four entries are (f_u, f_v, c_u, c_v).

    Returns (P2 (3, 4), R0_rect (3, 3), Tr_velo_to_cam (3, 4)) with
      P2 = [[f_u, 0, c_u, 0], [0, f_v, c_v, 0], [0, 0, 1, 0]]   (intrinsics
        only — the waymo-axes offset cancels against the virtual reference
        frame, reference converter.py:189-200),
      R0_rect = identity (waymo has no rectified frame), and
      Tr_velo_to_cam = T_front_cam_to_ref @ inv(T_front_cam_to_vehicle)
        (lidar points live in the vehicle frame, converter.py:263).
    """
    extrinsic = np.asarray(extrinsic, np.float64).reshape(4, 4)
    f_u, f_v, c_u, c_v = [float(v) for v in intrinsic[:4]]
    P2 = np.array([[f_u, 0, c_u, 0], [0, f_v, c_v, 0], [0, 0, 1, 0]], np.float64)
    Tr = _cart_to_homo(T_FRONT_CAM_TO_REF) @ np.linalg.inv(extrinsic)
    return P2, np.eye(3), Tr[:3, :]


def label_box_to_kitti(center_vehicle, height: float, heading: float,
                       Tr_velo_to_cam: np.ndarray) -> tuple:
    """Waymo 3D box (vehicle frame, volumetric center) -> KITTI label fields
    (pure math; reference converter.py:425-451).

    Returns (center_cam (3,), rotation_y, alpha): bottom-centered box center
    in the KITTI camera frame, yaw about the camera y axis
    (-heading - pi/2, wrapped to [-pi, pi)), and the observation angle
    alpha = rotation_y - atan2(x, z). The reference leaves rotation_y
    unwrapped and writes alpha = -10 ("contribution is welcome",
    converter.py:465-468); the wrap is equivalent mod 2*pi and the computed
    alpha follows the KITTI devkit definition.
    """
    cx, cy, cz = [float(v) for v in center_vehicle]
    bottom = np.array([cx, cy, cz - height / 2.0, 1.0])
    center_cam = np.asarray(Tr_velo_to_cam, np.float64) @ bottom
    rotation_y = -float(heading) - np.pi / 2
    rotation_y = (rotation_y + np.pi) % (2 * np.pi) - np.pi
    alpha = rotation_y - np.arctan2(center_cam[0], center_cam[2])
    return center_cam[:3], rotation_y, alpha


def projected_box2d(center_x: float, center_y: float, length: float,
                    width: float) -> tuple:
    """Waymo projected 2D box (center + size) -> KITTI corner format
    (reference converter.py:361-363)."""
    return (center_x - length / 2, center_y - width / 2,
            center_x + length / 2, center_y + width / 2)


class WaymoToKITTI:
    """Convert a directory of Waymo .tfrecord segments to KITTI-format files."""

    def __init__(self, load_dir: str, save_dir: str, prefix: str = "",
                 workers: int = 8, test_mode: bool = False):
        # waymo_open_dataset/tensorflow are only required by the TFRecord
        # entry points (convert/convert_one); the per-frame writers consume
        # duck-typed frame protos and run without them (tested with fakes)
        self.load_dir = load_dir
        self.save_dir = os.path.join(save_dir, "training")
        self.prefix = prefix
        self.workers = workers
        self.test_mode = test_mode
        self.tfrecord_pathnames = sorted(
            os.path.join(load_dir, f) for f in os.listdir(load_dir)
            if f.endswith(".tfrecord")
        )
        for d in ["image", "calib", "label", "velodyne", "pose"]:
            os.makedirs(os.path.join(self.save_dir, d), exist_ok=True)

    def convert(self):
        _require_waymo()
        with Pool(self.workers) as pool:
            pool.map(self.convert_one, range(len(self.tfrecord_pathnames)))

    # -- per-segment ----------------------------------------------------------
    def convert_one(self, file_idx: int):
        _require_waymo()
        import tensorflow as tf
        from waymo_open_dataset import dataset_pb2

        pathname = self.tfrecord_pathnames[file_idx]
        dataset = tf.data.TFRecordDataset(pathname, compression_type="")
        for frame_idx, data in enumerate(dataset):
            frame = dataset_pb2.Frame()
            frame.ParseFromString(bytearray(data.numpy()))
            stem = f"{self.prefix}{file_idx:03d}{frame_idx:03d}"
            self.convert_frame(frame, stem)

    def convert_frame(self, frame, stem: str, with_lidar: bool = True):
        """Write all KITTI-format files for one frame. Everything except
        save_lidar consumes duck-typed proto attributes and runs without
        waymo_open_dataset (with_lidar=False in environments/tests without
        it — save_lidar needs frame_utils range-image decoding)."""
        self.save_image(frame, stem)
        self.save_calib(frame, stem)
        if with_lidar:
            self.save_lidar(frame, stem)
        self.save_pose(frame, stem)
        if not self.test_mode:
            self.save_label(frame, stem)

    def save_image(self, frame, stem: str):
        import io

        from PIL import Image

        for img in frame.images:
            if img.name != _T_FRONT_CAM:
                continue
            # PIL decodes the JPEG bytes directly — no tensorflow dependency
            Image.open(io.BytesIO(img.image)).save(
                os.path.join(self.save_dir, "image", stem + ".png"))

    def save_calib(self, frame, stem: str):
        """Front-camera calibration in KITTI convention (math in
        front_calib_matrices; reference converter.py:166-266)."""
        P2 = Tr_velo_to_cam = None
        for camera in frame.context.camera_calibrations:
            if camera.name != _T_FRONT_CAM:
                continue
            extrinsic = np.array(camera.extrinsic.transform).reshape(4, 4)
            P2, _, Tr_velo_to_cam = front_calib_matrices(
                extrinsic, list(camera.intrinsic))
            self._Tr_velo_to_cam = Tr_velo_to_cam
        calib_lines = []
        for pname in ["P0", "P1", "P2", "P3"]:
            calib_lines.append(
                f"{pname}: " + " ".join(f"{v:e}" for v in P2.reshape(-1)))
        calib_lines.append("R0_rect: " + " ".join(f"{v:e}" for v in np.eye(3).reshape(-1)))
        calib_lines.append(
            "Tr_velo_to_cam: " + " ".join(f"{v:e}" for v in Tr_velo_to_cam.reshape(-1)))
        with open(os.path.join(self.save_dir, "calib", stem + ".txt"), "w") as f:
            f.write("\n".join(calib_lines) + "\n")

    def save_lidar(self, frame, stem: str):
        from waymo_open_dataset.utils import frame_utils

        range_images, camera_projections, _, range_image_top_pose = (
            frame_utils.parse_range_image_and_camera_projection(frame))
        points, cp_points = frame_utils.convert_range_image_to_point_cloud(
            frame, range_images, camera_projections, range_image_top_pose)
        points_all = np.concatenate(points, axis=0)
        intensity = np.ones((points_all.shape[0], 1), np.float32)
        pc = np.concatenate([points_all, intensity], axis=1).astype(np.float32)
        pc.tofile(os.path.join(self.save_dir, "velodyne", stem + ".bin"))

    def save_pose(self, frame, stem: str):
        pose = np.array(frame.pose.transform).reshape(4, 4)
        np.savetxt(os.path.join(self.save_dir, "pose", stem + ".txt"), pose)

    def save_label(self, frame, stem: str):
        """Project waymo 3D labels to the front camera in KITTI label format
        (reference converter.py:345-519): type trunc occl alpha box2d hwl t ry."""
        # waymo label_pb2.Label.Type enum values (stable proto constants:
        # UNKNOWN=0, VEHICLE=1, PEDESTRIAN=2, SIGN=3, CYCLIST=4) — inlined so
        # the label writer runs without waymo_open_dataset installed
        type_map = {1: "Car", 2: "Pedestrian", 4: "Cyclist", 3: "Sign"}
        # front-cam projected boxes by object id
        proj_boxes = {}
        for labels in frame.projected_lidar_labels:
            if labels.name != _T_FRONT_CAM:
                continue
            for label in labels.labels:
                obj_id = label.id.replace("_FRONT", "")
                proj_boxes[obj_id] = label.box

        Tr = getattr(self, "_Tr_velo_to_cam", None)
        if Tr is None:
            from supnerf_tpu.data.kitti_format import Calibration

            Tr = Calibration(
                os.path.join(self.save_dir, "calib", stem + ".txt")).V2C
        lines = []
        for label in frame.laser_labels:
            if label.id not in proj_boxes:
                continue
            if label.type not in type_map:
                continue
            box2d = proj_boxes[label.id]
            x0, y0, x1, y1 = projected_box2d(
                box2d.center_x, box2d.center_y, box2d.length, box2d.width)
            b = label.box
            center_cam, rotation_y, alpha = label_box_to_kitti(
                (b.center_x, b.center_y, b.center_z), b.height, b.heading, Tr)
            lines.append(
                f"{type_map[label.type]} 0.00 0 {alpha:.2f} "
                f"{x0:.2f} {y0:.2f} {x1:.2f} {y1:.2f} "
                f"{b.height:.2f} {b.width:.2f} {b.length:.2f} "
                f"{center_cam[0]:.2f} {center_cam[1]:.2f} {center_cam[2]:.2f} "
                f"{rotation_y:.2f}")
        with open(os.path.join(self.save_dir, "label", stem + ".txt"), "w") as f:
            f.write("\n".join(lines) + "\n")


def write_split_from_images(data_dir: str, split_name: str = "val",
                            every_n: int = 1):
    """Write <data_dir>/<split_name>.txt listing converted frame stems;
    every_n subsamples for val_small (the val/val_small.txt files the repo
    ships, reference data/Waymo/{val,val_small}.txt)."""
    img_dir = os.path.join(data_dir, "training", "image")
    stems = sorted(os.path.splitext(f)[0] for f in os.listdir(img_dir))
    stems = stems[::every_n]
    with open(os.path.join(data_dir, f"{split_name}.txt"), "w") as f:
        f.write("\n".join(stems) + "\n")
    return stems


def setup_split(data_dir: str, org_dir: str, split_list_file: str,
                out_split_file: str, *, symlink: bool = True,
                org_subdirs=("calib", "image_0", "label_0", "velodyne"),
                out_subdirs=("calib", "image", "label", "velodyne"),
                exts=(".txt", ".png", ".txt", ".bin")):
    """Renumber per-segment KITTI-format files into the flat training layout
    (reference data/Waymo/setup_split.py): read 'seg frame_id' lines from
    split_list_file, link (or copy) each segment's calib/image/label/velodyne
    files into <data_dir>/training/<out_subdir>/<new_id><ext> with sequential
    6-digit ids, and write the new ids to out_split_file. Entries whose
    calib/label/image are missing are skipped but still CONSUME an id
    (the reference increments imind on the missing branch too,
    setup_split.py:163-166). Returns the list of linked new ids."""
    out_dirs = [os.path.join(data_dir, "training", d) for d in out_subdirs]
    for d in out_dirs:
        os.makedirs(d, exist_ok=True)
    with open(split_list_file) as f:
        entries = [ln.strip().split() for ln in f if ln.strip()]

    import shutil

    linked = []
    with open(out_split_file, "w") as out:
        for imind, (seg, fid) in enumerate(entries):
            new_id = f"{imind:06d}"
            src = [os.path.join(org_dir, seg, sd, fid + ext)
                   for sd, ext in zip(org_subdirs, exts)]
            # presence gate mirrors the reference: calib + image + label
            required = [s for s, sd in zip(src, org_subdirs)
                        if sd in ("calib", "image_0", "label_0")]
            if not all(os.path.exists(p) for p in required):
                print(f"{seg}/{fid} not found ...")
                continue
            for s, d, ext in zip(src, out_dirs, exts):
                dst = os.path.join(d, new_id + ext)
                if os.path.exists(dst) or not os.path.exists(s):
                    continue
                if symlink:
                    os.symlink(s, dst)
                else:
                    shutil.copy(s, dst)
            out.write(new_id + "\n")
            linked.append(new_id)
    return linked


def main(argv=None):
    """CLI matching the reference converter's script usage
    (data/Waymo/converter.py __main__: load_dir/save_dir/prefix/num_proc,
    setup_split.py as a separate step)."""
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("convert", help="TFRecord segments -> KITTI format")
    c.add_argument("load_dir")
    c.add_argument("save_dir")
    c.add_argument("--prefix", default="")
    c.add_argument("--workers", type=int, default=8)
    c.add_argument("--test_mode", action="store_true")
    s = sub.add_parser("setup-split", help="renumber per-segment files into "
                                           "the flat training layout")
    s.add_argument("data_dir")
    s.add_argument("org_dir")
    s.add_argument("split_list_file")
    s.add_argument("out_split_file")
    s.add_argument("--copy", action="store_true", help="copy instead of symlink")
    args = ap.parse_args(argv)
    if args.cmd == "convert":
        WaymoToKITTI(args.load_dir, args.save_dir, prefix=args.prefix,
                     workers=args.workers, test_mode=args.test_mode).convert()
    else:
        setup_split(args.data_dir, args.org_dir, args.split_list_file,
                    args.out_split_file, symlink=not args.copy)


if __name__ == "__main__":
    main()
