from clipx.parallel.mesh import make_mesh, param_shardings  # noqa: F401
from clipx.parallel.mips import ShardedVectorIndex  # noqa: F401
