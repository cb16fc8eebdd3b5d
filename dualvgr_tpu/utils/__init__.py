from dualvgr_tpu.utils.logging import (  # noqa: F401
    MetricsWriter,
    colored,
    setup_logging,
    train_ticker,
)
