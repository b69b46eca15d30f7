from sessionsimilaritysearch_tpu.utils.logging import MetricLogger, RunDir  # noqa: F401
from sessionsimilaritysearch_tpu.utils.profiling import PhaseTimer, trace  # noqa: F401
from sessionsimilaritysearch_tpu.utils.sanitize import (  # noqa: F401
    assert_donates,
    assert_pure,
    debug_nans,
)
