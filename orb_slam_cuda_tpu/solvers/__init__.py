from . import pose_opt  # noqa: F401
