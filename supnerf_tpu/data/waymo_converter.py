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


class WaymoToKITTI:
    """Convert a directory of Waymo .tfrecord segments to KITTI-format files."""

    def __init__(self, load_dir: str, save_dir: str, prefix: str = "",
                 workers: int = 8, test_mode: bool = False):
        _require_waymo()
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
        with Pool(self.workers) as pool:
            pool.map(self.convert_one, range(len(self.tfrecord_pathnames)))

    # -- per-segment ----------------------------------------------------------
    def convert_one(self, file_idx: int):
        import tensorflow as tf
        from waymo_open_dataset import dataset_pb2

        pathname = self.tfrecord_pathnames[file_idx]
        dataset = tf.data.TFRecordDataset(pathname, compression_type="")
        for frame_idx, data in enumerate(dataset):
            frame = dataset_pb2.Frame()
            frame.ParseFromString(bytearray(data.numpy()))
            stem = f"{self.prefix}{file_idx:03d}{frame_idx:03d}"
            self.save_image(frame, stem)
            self.save_calib(frame, stem)
            self.save_lidar(frame, stem)
            self.save_pose(frame, stem)
            if not self.test_mode:
                self.save_label(frame, stem)

    def save_image(self, frame, stem: str):
        import tensorflow as tf

        for img in frame.images:
            if img.name != _T_FRONT_CAM:
                continue
            decoded = tf.image.decode_jpeg(img.image).numpy()
            from PIL import Image

            Image.fromarray(decoded).save(
                os.path.join(self.save_dir, "image", stem + ".png"))

    def save_calib(self, frame, stem: str):
        """Front-camera calibration in KITTI convention: the waymo camera frame
        (x front, y left, z up) is rotated to KITTI cam (x right, y down,
        z front) and composed with the extrinsics (reference converter.py:166)."""
        T_cam_to_kitti = np.array(
            [[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
        calib_lines = []
        Tr_velo_to_cam = None
        P2 = None
        for camera in frame.context.camera_calibrations:
            if camera.name != _T_FRONT_CAM:
                continue
            extrinsic = np.array(camera.extrinsic.transform).reshape(4, 4)
            T_vehicle_to_cam = np.linalg.inv(extrinsic)
            Tr = _cart_to_homo(T_cam_to_kitti) @ T_vehicle_to_cam
            Tr_velo_to_cam = Tr[:3, :]
            f_u, f_v, c_u, c_v = camera.intrinsic[:4]
            P2 = np.array(
                [[f_u, 0, c_u, 0], [0, f_v, c_v, 0], [0, 0, 1, 0]], np.float64)
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
        from waymo_open_dataset import label_pb2

        type_map = {
            label_pb2.Label.TYPE_VEHICLE: "Car",
            label_pb2.Label.TYPE_PEDESTRIAN: "Pedestrian",
            label_pb2.Label.TYPE_CYCLIST: "Cyclist",
            label_pb2.Label.TYPE_SIGN: "Sign",
        }
        # front-cam projected boxes by object id
        proj_boxes = {}
        for labels in frame.projected_lidar_labels:
            if labels.name != _T_FRONT_CAM:
                continue
            for label in labels.labels:
                obj_id = label.id.replace("_FRONT", "")
                proj_boxes[obj_id] = label.box

        calib_file = os.path.join(self.save_dir, "calib", stem + ".txt")
        from supnerf_tpu.data.kitti_format import Calibration

        calib = Calibration(calib_file)
        lines = []
        for label in frame.laser_labels:
            if label.id not in proj_boxes:
                continue
            if label.type not in type_map:
                continue
            box2d = proj_boxes[label.id]
            x0 = box2d.center_x - box2d.length / 2
            y0 = box2d.center_y - box2d.width / 2
            x1 = box2d.center_x + box2d.length / 2
            y1 = box2d.center_y + box2d.width / 2
            b = label.box
            # vehicle frame center -> cam rect frame, bottom-centered
            center = np.array([[b.center_x, b.center_y, b.center_z - b.height / 2]])
            hom = np.concatenate([center, np.ones((1, 1))], axis=1)
            center_cam = (calib.V2C @ hom.T).T[0]
            heading = -b.heading - np.pi / 2
            heading = (heading + np.pi) % (2 * np.pi) - np.pi
            alpha = heading - np.arctan2(center_cam[0], center_cam[2])
            lines.append(
                f"{type_map[label.type]} 0.00 0 {alpha:.2f} "
                f"{x0:.2f} {y0:.2f} {x1:.2f} {y1:.2f} "
                f"{b.height:.2f} {b.width:.2f} {b.length:.2f} "
                f"{center_cam[0]:.2f} {center_cam[1]:.2f} {center_cam[2]:.2f} "
                f"{heading:.2f}")
        with open(os.path.join(self.save_dir, "label", stem + ".txt"), "w") as f:
            f.write("\n".join(lines) + "\n")


def setup_split(data_dir: str, split_name: str = "val", every_n: int = 1):
    """Write <data_dir>/<split_name>.txt listing converted frame stems
    (reference setup_split.py); every_n subsamples for val_small."""
    img_dir = os.path.join(data_dir, "training", "image")
    stems = sorted(os.path.splitext(f)[0] for f in os.listdir(img_dir))
    stems = stems[::every_n]
    with open(os.path.join(data_dir, f"{split_name}.txt"), "w") as f:
        f.write("\n".join(stems) + "\n")
    return stems
