from ray_tracer_2_tpu.scene.material import (  # noqa: F401
    MaterialFlag, MaterialDefinition, MaterialRecord, MaterialTable,
)
from ray_tracer_2_tpu.scene.camera import Camera, CameraDescriptor, CameraController  # noqa: F401
from ray_tracer_2_tpu.scene.definition import SceneDefinition, EntityDefinition  # noqa: F401
from ray_tracer_2_tpu.scene.render_scene import RenderScene  # noqa: F401
from ray_tracer_2_tpu.scene.scenes import SceneName, build_scene_definition  # noqa: F401
from ray_tracer_2_tpu.scene.manager import SceneManager  # noqa: F401
