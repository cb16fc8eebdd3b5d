from dualvgr_tpu.models.backbones.resnet2d import ResNet101, port_resnet101_state_dict  # noqa: F401
from dualvgr_tpu.models.backbones.resnext3d import ResNeXt101_3D, port_resnext101_state_dict  # noqa: F401
