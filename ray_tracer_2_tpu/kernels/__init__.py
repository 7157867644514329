from ray_tracer_2_tpu.kernels.trace import trace_pixels, debug_trace_pixels  # noqa: F401
