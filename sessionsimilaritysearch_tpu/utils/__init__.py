from sessionsimilaritysearch_tpu.utils.logging import MetricLogger, RunDir  # noqa: F401
from sessionsimilaritysearch_tpu.utils.profiling import PhaseTimer, trace  # noqa: F401
