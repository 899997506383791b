from points_matching_tpu.data import synthetic  # noqa: F401
