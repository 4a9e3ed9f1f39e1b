"""Worker for the 2-process multi-controller CPU dryrun (not a test file).

Launched by test_multiprocess.py / dryrun with SUPERNOVA_* env set: joins
the fleet via jax.distributed, builds the global ("host","chip") mesh, runs
the DCN-aware hierarchical sharded count on a deterministic readset, gathers
the full result over the fleet (process_allgather = a real DCN collective),
and dumps it for the launcher to compare against the single-process run.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from supernova_tpu.parallel.dist import (  # noqa: E402 (before jax use)
    fleet_mesh,
    from_global,
    init_from_env,
    to_global,
)

if __name__ == "__main__":
    assert init_from_env(), "worker requires SUPERNOVA_* multi-process env"

import numpy as np  # noqa: E402

from supernova_tpu.ingest.reads import build_readset  # noqa: E402


def dryrun_readset(n_groups: int, seed: int = 0):
    """The dryrun's synthetic barcoded readset (kmers recur across barcodes
    so they survive the (min_freq, min_bc) filter).  Deterministic."""
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, 600, dtype=np.uint8)
    reads, quals, bcs = [], [], []
    for i in range(8 * n_groups):
        s = int(rng.integers(0, len(genome) - 120))
        reads.append(genome[s : s + 120].copy())
        reads.append(genome[s + 1 : s + 121].copy())
        quals.append(np.full(120, 37, np.uint8))
        quals.append(np.full(120, 37, np.uint8))
        bcs.append(1 + (i % 5))
    return build_readset(reads, quals, np.asarray(bcs), n_barcodes=8)


def main() -> None:
    import jax
    from jax.sharding import PartitionSpec as P

    from supernova_tpu.parallel.mesh import CHIP_AXIS, HOST_AXIS
    from supernova_tpu.parallel.sharded_count import (
        sharded_count_hier,
        split_readset,
    )

    out = os.environ["MPW_OUT"]
    n_hosts = jax.process_count()
    chips = jax.local_device_count()
    n_dev = n_hosts * chips
    mesh = fleet_mesh()

    rs = dryrun_readset(n_dev)
    codes, pr, glp, bcp, nbl, rl, url = split_readset(
        rs, n_dev, base_bucket=2048, read_bucket=64
    )
    spec = P((HOST_AXIS, CHIP_AXIS))
    args = [
        to_global(mesh, spec, np.asarray(a)) for a in (codes, pr, glp, bcp)
    ]
    tables, ovf = sharded_count_hier(
        mesh,
        *args,
        n_hosts=n_hosts,
        chips_per_host=chips,
        capacity=2 * nbl,
        min_freq=1,
        uniform_rl=url,
    )
    assert int(np.asarray(from_global(ovf)).sum()) == 0, "shuffle overflow"
    # full fleet-wide gather of every table leaf (rides the DCN axis)
    full = {
        "wa": from_global(tables.words.a),
        "wb": from_global(tables.words.b),
        "wc": from_global(tables.words.c),
        "count": from_global(tables.count),
        "nbc": from_global(tables.nbc),
        "n_valid": from_global(tables.n_valid),
    }
    # ---- distributed build -> path -> nucleate glue over the fleet ------
    # (the full §5.8 story: every heavy stage runs under real
    # jax.distributed, like the reference's cluster-wide mrp — _mrp:26)
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as Pn

    from supernova_tpu.core import kmer_codec as kcodec
    from supernova_tpu.parallel.dist import ensure_global, host_fetch
    from supernova_tpu.parallel.mesh import AXIS, make_mesh
    from supernova_tpu.parallel.sharded_build import sharded_build_graph
    from supernova_tpu.parallel.sharded_count import sharded_count
    from supernova_tpu.parallel.sharded_nucleate import glue_closures_sharded
    from supernova_tpu.parallel.sharded_path import (
        sharded_path,
        split_for_pathing,
    )

    mesh1 = make_mesh(n_dev)
    sp = Pn(AXIS)
    codes1, pr1, glp1, bcp1, nbl1, rl1, url1 = split_readset(
        rs, n_dev, base_bucket=2048, read_bucket=64
    )
    tables1, ovf1 = sharded_count(
        mesh1,
        *(ensure_global(mesh1, sp, np.asarray(a))
          for a in (codes1, pr1, glp1, bcp1)),
        n_dev=n_dev,
        capacity=2 * nbl1,
        min_freq=1,
        uniform_rl=url1,
    )
    assert int(host_fetch(ovf1).sum()) == 0
    bg = sharded_build_graph(mesh1, tables1, n_dev)

    pcodes, poff, ppr, prlen, _, rl2, idxb = split_for_pathing(
        rs, n_dev, base_bucket=2048, read_bucket=64
    )
    rp = sharded_path(
        mesh1,
        kcodec.np_to_soa(bg.kmer_words),
        jnp.asarray(bg.node_edge),
        jnp.asarray(bg.node_pos),
        jnp.asarray(bg.from_v.astype(np.int32)),
        jnp.asarray(bg.to_v.astype(np.int32)),
        jnp.asarray((bg.edges.lengths() - (kcodec.K - 1)).astype(np.int32)),
        *(ensure_global(mesh1, sp, np.asarray(a))
          for a in (pcodes, poff, ppr, prlen)),
    )
    path_len = host_fetch(rp.path_len)
    path_edges = host_fetch(rp.edges)

    # nucleate glue: closures = the real read-path walks (deterministic on
    # every process — the fleet-gathered paths), labels over the mesh
    from supernova_tpu.asm.nucleate import sanitize_closures

    walks = []
    for r in range(path_edges.shape[0]):
        L = int(path_len[r])
        if L > 0:
            walks.append([int(e) for e in path_edges[r, :L]])
    cls = sanitize_closures(bg, walks)
    labels, govf = glue_closures_sharded(
        mesh1, bg, cls, min_over_bases=100, adaptive=False
    )

    np.savez(
        os.path.join(out, f"rank{jax.process_index()}.npz"),
        **full,
        n_dev=n_dev,
        graph_checksum=np.uint64(bg.checksum()),
        graph_n_edges=np.int64(bg.n_edges),
        graph_inv=bg.inv,
        path_len=path_len,
        path_edges=path_edges,
        glue_labels=labels,
        glue_ovf=np.int64(govf),
    )
    print(f"rank {jax.process_index()} ok", flush=True)


if __name__ == "__main__":
    main()
