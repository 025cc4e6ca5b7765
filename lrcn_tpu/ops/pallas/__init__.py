from lrcn_tpu.ops.pallas.lstm_step import (
    fused_lstm_step,
    fused_lstm_step_fn,
    pallas_available,
)

__all__ = ["fused_lstm_step", "fused_lstm_step_fn", "pallas_available"]
