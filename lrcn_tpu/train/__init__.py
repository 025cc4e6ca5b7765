from lrcn_tpu.train.checkpoint import (  # noqa: F401
    load_checkpoint,
    save_checkpoint,
)
from lrcn_tpu.train.joint import JointTrainer  # noqa: F401
from lrcn_tpu.train.metrics import MetricsLogger  # noqa: F401
from lrcn_tpu.train.trainer import Trainer  # noqa: F401
