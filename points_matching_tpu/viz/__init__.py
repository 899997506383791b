from points_matching_tpu.viz.draw import (  # noqa: F401
    draw_keypoints,
    draw_matches,
    draw_epilines,
    save_png,
)
