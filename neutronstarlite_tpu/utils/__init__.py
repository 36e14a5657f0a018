from neutronstarlite_tpu.utils.timing import PhaseTimer  # noqa: F401
from neutronstarlite_tpu.utils.logging import get_logger  # noqa: F401
