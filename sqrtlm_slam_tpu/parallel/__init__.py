"""Distributed execution: mesh utilities, sharded BA collectives."""

from . import dist_ba
from .dist_ba import ShardedBAProblem, distributed_ba, make_distributed_ba_step, partition_problem

__all__ = [
    "dist_ba",
    "ShardedBAProblem",
    "distributed_ba",
    "make_distributed_ba_step",
    "partition_problem",
]
