"""Multi-chip effective-volume production over a (event, channel) device mesh.

On real hardware this runs unchanged over a TPU pod slice; here it
demonstrates the sharding on a virtual 8-device CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python run_sharded_veff.py

Event groups are data-parallel over the 'event' axis; detector channels are
model-parallel over the 'channel' axis; the Veff reduction is a cross-device
sum the compiler lowers to psum over ICI.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

# the axon TPU plugin overrides the JAX_PLATFORMS env var; pin the platform
# via config BEFORE the backend initializes when CPU was requested
if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from __graft_entry__ import _make_settings_and_inputs
from nuradiomc_tpu.parallel import mesh as mesh_util
from nuradiomc_tpu.sim.pipeline import simulate_batch

n_dev = len(jax.devices())
mesh = mesh_util.make_mesh(n_event=max(n_dev // 2, 1),
                           n_channel=2 if n_dev % 2 == 0 else 1)
print(f"devices: {n_dev}, mesh: {dict(mesh.shape)}")

settings, ch, batch = _make_settings_and_inputs(
    n_groups=64, n_showers=2, n_channels=4, n_internal=256, n_base=512)
batch = mesh_util.shard_batch(batch, mesh)
ch = jax.tree.map(lambda a: jax.device_put(
    a, NamedSharding(mesh, P("channel"))), ch)


@jax.jit
def production_step(b, c):
    out = simulate_batch(b, c, settings)
    # global trigger count: XLA inserts the cross-device reduction
    return jnp.sum(out.triggered.astype(jnp.int32)), out.max_amplitude


n_trig, max_amp = jax.block_until_ready(production_step(batch, ch))
print("sharding of max_amplitude:", max_amp.sharding)
print(f"triggered {int(n_trig)} / {batch.energies.shape[0]} groups")
