"""Training drivers: GSPMD pretrain / finetune / sliding-window test.

Reference: ED/main_pretrain.py, ED/main_finetune.py, ED/test_gpu.py,
ED/mmcv_custom/ (layer-decay optimizer constructors), ED/utils.py (schedules).
"""

from samrs_tpu.train.trainer import (  # noqa: F401
    TrainState,
    cross_entropy_ignore,
    make_pretrain_step,
    make_finetune_step,
    make_eval_step,
)
from samrs_tpu.train.optim import build_optimizer, warmup_cosine_schedule  # noqa: F401
