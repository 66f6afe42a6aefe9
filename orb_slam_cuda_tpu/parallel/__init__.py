from .mesh import make_mesh  # noqa: F401
from .dist_ba import distributed_bundle_adjust, shard_problem  # noqa: F401
