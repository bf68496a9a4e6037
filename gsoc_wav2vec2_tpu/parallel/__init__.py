from . import multihost
from .mesh import DATA_AXIS, MODEL_AXIS, batch_sharding, make_mesh, replicated
from .partition import param_shardings, param_specs, shard_params

__all__ = [
    "multihost",
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "param_specs",
    "param_shardings",
    "shard_params",
]
