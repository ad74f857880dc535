from supnerf_tpu.tto.core import TTOConfig, ObjectBatch, run_tto_batch
from supnerf_tpu.tto.refiner import fw_pose_refine, compose_pose_delta
from supnerf_tpu.tto.driver import TTODriver, tto_config_from_hpams  # noqa: E402
