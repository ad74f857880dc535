from supnerf_tpu.ops import volume_render
