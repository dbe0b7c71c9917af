from .mesh import fragment_mesh, shard_leading_axis  # noqa: F401
from .executor import FragmentExecutor  # noqa: F401
