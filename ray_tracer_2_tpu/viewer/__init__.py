from ray_tracer_2_tpu.viewer.server import ViewerServer, run_viewer  # noqa: F401
