from ray_tracer_2_tpu.utils.profiling import profile_trace, device_memory_stats  # noqa: F401
