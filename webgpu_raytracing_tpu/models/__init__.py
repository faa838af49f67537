from .scene import Scene, load_scene  # noqa: F401
from .test_models import triangle_model, unit_cube_model  # noqa: F401
