"""Device mesh and sharding helpers.

The reference scales by file splitting + cluster batch jobs
(SURVEY.md 2.9; generator.py:88-199, utilities/runner.py). The TPU-native
equivalent is SPMD over a `jax.sharding.Mesh`:

* ``event`` axis — data parallelism over event groups (the physics MC's
  embarrassingly parallel axis; replaces file splitting),
* ``channel`` axis — model-parallel-style sharding over detector channels
  for very large arrays (phased arrays, LOFAR-scale stations); trigger
  majority reductions become XLA collectives over this axis.

Per-host input reading + `jax.distributed` extends the same program to
multi-slice; the Veff accumulation is a `psum` over the mesh.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_event: int | None = None, n_channel: int = 1,
              devices=None) -> Mesh:
    """Build a (event, channel) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_event is None:
        n_event = n // n_channel
    if n_event * n_channel != n:
        # backend initialized with fewer devices than requested (e.g. module
        # executed directly on a 1-chip axon session): degrade gracefully to
        # whatever mesh fits — the driver invokes dryrun with the virtual
        # CPU device count set before process start, where this is exact
        n_channel = 2 if (n % 2 == 0 and n >= 2) else 1
        n_event = n // n_channel
    dev_array = np.array(devices).reshape(n_event, n_channel)
    return Mesh(dev_array, axis_names=("event", "channel"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for ShowerBatch leaves: shard the leading group axis."""
    return NamedSharding(mesh, P("event"))


def channel_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for ChannelParams leaves: shard the leading channel axis."""
    return NamedSharding(mesh, P("channel"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a ShowerBatch with its group axis split over the event axis."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, s), batch)


def shard_channels(ch, mesh: Mesh):
    """Place ChannelParams split over the channel axis."""
    s = channel_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, s), ch)
