"""Multi-chip parallelism: meshes, sharded training, exact global argmax."""

from .dist_train import (
    DistState,
    init_dist_state,
    make_dist_train_batch,
    shard_stream,
)
from .mesh import make_mesh
from .multihost import init_multihost, shutdown_multihost
from .trainer import DistributedTrainer

__all__ = [
    "DistState",
    "DistributedTrainer",
    "init_dist_state",
    "init_multihost",
    "make_dist_train_batch",
    "make_mesh",
    "shard_stream",
    "shutdown_multihost",
]
