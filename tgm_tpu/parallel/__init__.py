from .mesh import data_model_mesh, initialize_distributed, make_mesh
from .sharding import (
    batch_shardings,
    replicate_tree,
    replicated,
    row_sharded,
    shard_leading_axis,
    tgat_carry_shardings,
    tgat_carry_shardings_2d,
    tgn_carry_shardings,
    tgn_carry_shardings_2d,
    tp_param_shardings,
)

__all__ = [
    "tp_param_shardings",
    "tgn_carry_shardings_2d",
    "batch_shardings",
    "data_model_mesh",
    "initialize_distributed",
    "make_mesh",
    "replicate_tree",
    "replicated",
    "row_sharded",
    "shard_leading_axis",
    "tgat_carry_shardings",
    "tgat_carry_shardings_2d",
    "tgn_carry_shardings",
]
