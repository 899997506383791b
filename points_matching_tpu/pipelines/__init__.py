from points_matching_tpu.pipelines.two_view import (  # noqa: F401
    two_view_pipeline,
    TwoViewResult,
    run_two_view_demo,
)
