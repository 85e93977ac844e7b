from .mesh import (  # noqa: F401
    MeshConfig,
    make_mesh,
    shard_batch,
    replicate,
    initialize_multihost,
    process_count,
    process_index,
)
