from convtasnet_tpu.ops.frames import frame_signal, overlap_and_add  # noqa: F401
from convtasnet_tpu.ops.norm import channelwise_layer_norm, global_layer_norm  # noqa: F401
from convtasnet_tpu.ops.conv import depthwise_conv1d, pointwise_conv, prelu  # noqa: F401
