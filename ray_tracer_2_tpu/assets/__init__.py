from ray_tracer_2_tpu.assets.manager import AssetManager  # noqa: F401
from ray_tracer_2_tpu.assets.obj import load_obj, load_mtl  # noqa: F401
from ray_tracer_2_tpu.assets.textures import TextureAtlas  # noqa: F401
