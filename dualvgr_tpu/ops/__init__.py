from dualvgr_tpu.ops.lstm import LSTMParams, bilstm, lstm_unroll, init_lstm_params  # noqa: F401
from dualvgr_tpu.ops.losses import (  # noqa: F401
    common_loss,
    cross_entropy_loss,
    hsic_dependence_loss,
)
