from points_matching_tpu.core import config, types  # noqa: F401
