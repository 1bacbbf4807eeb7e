from bang_tpu.utils.config import SearchParams, DATASET_PRESETS  # noqa: F401
from bang_tpu.utils.recall import calculate_recall  # noqa: F401
from bang_tpu.utils.timer import CPUTimer, StageTimers  # noqa: F401
from bang_tpu.utils.logging import log_message  # noqa: F401
