from sessionsimilaritysearch_tpu.training import losses  # noqa: F401
