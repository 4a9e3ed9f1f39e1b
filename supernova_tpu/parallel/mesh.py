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
HOST_AXIS = "host"  # slow fabric (DCN) axis of the 2-D mesh
CHIP_AXIS = "chip"  # fast fabric (ICI) axis of the 2-D mesh


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


def make_mesh2(n_hosts: int, chips_per_host: int) -> Mesh:
    """2-D ("host", "chip") mesh for multi-host runs: collectives over
    CHIP_AXIS ride ICI, collectives over HOST_AXIS ride DCN.  On a real
    multi-host fleet jax.devices() orders devices host-major, so rows of
    the mesh coincide with physical hosts."""
    need = n_hosts * chips_per_host
    devs = jax.devices()
    if len(devs) < need:
        raise ValueError(
            f"need {need} devices, have {len(devs)} "
            "(set XLA_FLAGS=--xla_force_host_platform_device_count=N)"
        )
    return jax.make_mesh(
        (n_hosts, chips_per_host), (HOST_AXIS, CHIP_AXIS), devices=devs[:need]
    )


def shard_rows(mesh: Mesh):
    return NamedSharding(mesh, P(AXIS))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
