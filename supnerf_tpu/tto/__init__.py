from supnerf_tpu.tto.core import TTOConfig, ObjectBatch, run_tto_batch
from supnerf_tpu.tto.refiner import fw_pose_refine, compose_pose_delta
