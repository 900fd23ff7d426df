from .mesh import make_mesh, shard_spec  # noqa: F401
