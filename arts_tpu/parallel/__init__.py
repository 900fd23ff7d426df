from .mesh import (  # noqa: F401
    initialize_distributed,
    make_hybrid_mesh,
    make_mesh,
    shard_spec,
)
