from supnerf_tpu.training.train_step import (
    TrainBatch,
    TrainConfig,
    TrainState,
    init_train_state,
    make_train_multi_step,
    make_train_step,
    unified_loss,
)
from supnerf_tpu.training.trainer import UnifiedTrainer  # noqa: E402
