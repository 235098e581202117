from .mesh import make_mesh, split_core_groups
from .sharding import shard_whisper_params, whisper_param_specs

__all__ = [
    "make_mesh",
    "shard_whisper_params",
    "split_core_groups",
    "whisper_param_specs",
]
