from convtasnet_tpu.data.audio_io import read_wav, write_wav  # noqa: F401
from convtasnet_tpu.data.manifest import build_manifest, build_manifests  # noqa: F401
from convtasnet_tpu.data.dataset import SeparationDataset, EvalDataset  # noqa: F401
from convtasnet_tpu.data.loader import BatchLoader  # noqa: F401
