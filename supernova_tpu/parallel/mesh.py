"""Device mesh helpers.

The framework's parallelism model (SURVEY.md §5.8): one logical axis "shard"
over which (a) reads are data-parallel and (b) kmer space / graph tables are
hash-sharded; the MSP 8192-disk-shard shuffle of the reference
(lib/tada/src/cmd_msp.rs:44-50) becomes an on-fabric all-to-all over this
axis.  Multi-host later splits this into ("host", "chip") with DCN/ICI
placement; the algorithms only see the flattened axis.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "shard"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devs)} "
                "(set XLA_FLAGS=--xla_force_host_platform_device_count=N)"
            )
        devs = devs[:n_devices]
    return jax.make_mesh((len(devs),), (AXIS,), devices=devs)


def shard_rows(mesh: Mesh):
    return NamedSharding(mesh, P(AXIS))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
