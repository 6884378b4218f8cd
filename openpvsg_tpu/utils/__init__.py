from openpvsg_tpu.utils.profiling import StageTimer, Timer, trace
from openpvsg_tpu.utils.logging import MetricsLogger
