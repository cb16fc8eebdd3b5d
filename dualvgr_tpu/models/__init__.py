from dualvgr_tpu.models.dualvgr import DualVGR, DualVGROutput  # noqa: F401
