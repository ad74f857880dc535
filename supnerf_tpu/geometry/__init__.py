from supnerf_tpu.geometry import rotations, boxes, rays, roi, poses
