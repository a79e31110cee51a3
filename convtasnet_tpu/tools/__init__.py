from convtasnet_tpu.tools.activlev import active_level  # noqa: F401
from convtasnet_tpu.tools.mixture import create_mixtures, make_pair_list  # noqa: F401
