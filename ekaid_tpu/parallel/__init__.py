"""Device-mesh, sharding rules, and collective utilities."""

from ekaid_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, batch_shardings, param_shardings, replicated,
)
