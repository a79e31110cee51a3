from convtasnet_tpu.infer.separate import separate  # noqa: F401
from convtasnet_tpu.infer.evaluate import evaluate  # noqa: F401
