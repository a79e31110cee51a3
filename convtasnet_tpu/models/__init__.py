from convtasnet_tpu.models.conv_tasnet import ConvTasNet  # noqa: F401
