from convtasnet_tpu.ops.pallas.tcn_block import fused_tcn_block  # noqa: F401
