from convtasnet_tpu.models.conv_tasnet import ConvTasNet  # noqa: F401
from convtasnet_tpu.models.dual_path import DualPathSeparator  # noqa: F401
