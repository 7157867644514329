from ray_tracer_2_tpu.math.vec import (  # noqa: F401
    cross, dot, length, normalize, reflect, refract, lerp, smoothstep,
)
from ray_tracer_2_tpu.math.transform import (  # noqa: F401
    Transform, quat_identity, quat_from_euler_yxz, quat_rotate_y,
    quat_rotate_x, quat_to_mat3, quat_from_axis_angle, look_at_quat,
)
