from ray_tracer_2_tpu.parallel.sharding import (  # noqa: F401
    make_render_mesh, render_frame_sharded, render_frame_spp_sharded,
)
