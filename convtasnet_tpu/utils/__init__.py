from convtasnet_tpu.utils.metrics import MetricsLogger  # noqa: F401
from convtasnet_tpu.utils.padding import remove_pad  # noqa: F401
