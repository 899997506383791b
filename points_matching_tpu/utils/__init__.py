from points_matching_tpu.utils import metrics, logging  # noqa: F401
