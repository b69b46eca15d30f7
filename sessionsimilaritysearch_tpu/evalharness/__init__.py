from sessionsimilaritysearch_tpu.evalharness import metrics  # noqa: F401
from sessionsimilaritysearch_tpu.evalharness.knn import (  # noqa: F401
    get_p_r,
    get_prediction_by_knn,
)
