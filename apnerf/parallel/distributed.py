"""Multi-host launch helpers.

The reference has no distributed runtime (SURVEY.md §2.3). Here: initialise
the JAX distributed runtime for multi-host TPU slices, build the global ray
mesh, and split the host-side ray-batch sampling per process so each host
feeds only its local shard (data loading rides DCN, gradients psum over
ICI).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """Initialise jax.distributed if we are part of a multi-process job.

    No-op for single-process runs. On TPU pods the arguments are inferred
    from the environment.
    """
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if (coordinator_address or (num_processes and num_processes > 1)
            or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")):
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_count(), jax.process_index()


def local_batch_slice(global_batch: int):
    """(start, size) of this process's slice of a globally sharded ray batch."""
    n = jax.process_count()
    i = jax.process_index()
    assert global_batch % n == 0, (global_batch, n)
    per = global_batch // n
    return i * per, per


def host_local_batch(sample_fn, global_batch: int, seed_step: int):
    """Sample only this host's ray-batch slice.

    ``sample_fn(start, size, seed)`` must be deterministic given the seed so
    every process draws from the same global permutation.
    """
    start, per = local_batch_slice(global_batch)
    return sample_fn(start, per, seed_step)
