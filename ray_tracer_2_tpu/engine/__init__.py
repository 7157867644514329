from ray_tracer_2_tpu.engine.renderer import Renderer  # noqa: F401
from ray_tracer_2_tpu.engine.engine import Engine, FrameTiming  # noqa: F401
from ray_tracer_2_tpu.engine.export import framebuffer_to_srgb, save_png  # noqa: F401
