from ray_tracer_2_tpu.accel.bvh import BVH, BVHQuality, BVHStats, build_bvh  # noqa: F401
