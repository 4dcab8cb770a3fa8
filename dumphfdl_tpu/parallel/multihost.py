"""Multi-host deployment plumbing (jax.distributed).

The reference scales past one machine by running independent processes
aggregated over ZMQ (/root/reference/extras/log_aggregator.py,
README.md:969).  This framework instead forms one logical device mesh
across hosts: every process calls ``init_distributed`` (controller at
process 0), builds the global ('time','chan') mesh from
``parallel.sharding.make_mesh``, and feeds only its local SDR stream;
decoded messages are emitted host-locally (each host runs its own
output stack), so only overlap halos and the channel-sharded demod
state ride the interconnect.

Environment variables (systemd-friendly):
  DUMPHFDL_COORDINATOR   host:port of process 0
  DUMPHFDL_NUM_PROCESSES total process count
  DUMPHFDL_PROCESS_ID    this process's rank
"""

from __future__ import annotations

import os

import jax


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize jax.distributed from args or environment; returns True
    when running multi-process."""
    coordinator = coordinator or os.environ.get('DUMPHFDL_COORDINATOR')
    if coordinator is None:
        return False
    num_processes = int(num_processes
                        or os.environ.get('DUMPHFDL_NUM_PROCESSES', '1'))
    process_id = int(process_id
                     or os.environ.get('DUMPHFDL_PROCESS_ID', '0'))
    if num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def local_channel_slice(num_channels: int) -> slice:
    """The contiguous slice of the global channel list this host feeds."""
    n = jax.process_count()
    idx = jax.process_index()
    per = -(-num_channels // n)
    return slice(idx * per, min((idx + 1) * per, num_channels))
