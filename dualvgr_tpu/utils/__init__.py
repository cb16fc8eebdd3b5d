from dualvgr_tpu.utils.logging import colored, setup_logging, train_ticker  # noqa: F401
