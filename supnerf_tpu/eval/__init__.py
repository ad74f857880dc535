from supnerf_tpu.eval.aggregate import collect_eval_results
from supnerf_tpu.eval.metrics import ssim
