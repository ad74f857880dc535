"""Waymo-val dataset stored in KITTI format (front camera).

Capability-equivalent of /root/reference/src/data_waymo.py WaymoData :206,
which mirrors KittiData over the converted Waymo files (see
data/Waymo/converter.py in the reference and supnerf_tpu.data.waymo_converter);
only the directory layout ('image'/'label' instead of 'image_2'/'label_2') and
default thresholds differ.
"""
from __future__ import annotations

from supnerf_tpu.data.kitti import KittiData


class WaymoData(KittiData):
    LAYOUT = "waymo"
    NAME = "waymo"
