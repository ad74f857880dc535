from supnerf_tpu.models.supnerf import SUPNeRF
from supnerf_tpu.models.codenerf import CodeNeRF
from supnerf_tpu.models.autorf import AutoRF, AutoRFMix
from supnerf_tpu.models.factory import build_model
from supnerf_tpu.models.initialization import init_model_variables, param_count
