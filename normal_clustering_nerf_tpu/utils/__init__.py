from .rotations import (  # noqa: F401
    euler_angles_to_matrix,
    matrix_to_euler_angles,
    matrix_to_quaternion,
    quaternion_to_matrix,
    project_to_SO3,
)
