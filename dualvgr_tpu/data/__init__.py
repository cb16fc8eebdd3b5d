from dualvgr_tpu.data.loader import Batch, VideoQADataLoader  # noqa: F401
from dualvgr_tpu.data.vocab import load_vocab  # noqa: F401
