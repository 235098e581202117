from .mesh import make_mesh, mesh_from_spec, split_core_groups
from .sharding import shard_whisper_params, whisper_param_specs

__all__ = [
    "make_mesh",
    "mesh_from_spec",
    "shard_whisper_params",
    "split_core_groups",
    "whisper_param_specs",
]
