"""Stackaroo: scaffold gaps bridged by read stacks become sequence."""
import numpy as np

from supernova_tpu.align import pather
from supernova_tpu.asm import place as aplace
from supernova_tpu.asm import lines as alines
from supernova_tpu.asm import stackaroo as astk
from supernova_tpu.asm import supergraph as asg
from supernova_tpu.asm.scaffold import Scaffold
from supernova_tpu.core import dna
from supernova_tpu.dbg import build as dbuild
from supernova_tpu.dbg import graph as dgraph
from supernova_tpu.ingest.reads import build_readset
from supernova_tpu.kmer import count as kcount
from supernova_tpu.out import pseudohap as oph
from supernova_tpu.sim import genome as sim

from tests.test_dbg import perfect_readset


def test_stackaroo_fills_scaffold_gap(rng):
    g = sim.random_genome(rng, 6000)
    seg_a, seg_b = g[:3000], g[3100:]
    # assembly reads cover only the two segments -> two lines with a gap
    rs_ab = perfect_readset(np.concatenate([seg_a]), step=31)
    rs_b = perfect_readset(np.concatenate([seg_b]), step=31)
    reads = [rs_ab.read(i) for i in range(rs_ab.n_reads)] + [
        rs_b.read(i) for i in range(rs_b.n_reads)
    ]
    quals = [np.full(len(r), 37, np.uint8) for r in reads]
    rs_asm = build_readset(
        reads, quals, np.zeros(len(reads) // 2, np.int32), n_barcodes=0,
        barcoded=False,
    )
    table = dbuild.trim_table(kcount.count_readset(rs_asm, min_freq=2), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    D = asg.build_supergraph(bg)
    lines = alines.find_lines(D)

    # gap-bridging read set: proper FR pairs (350 bp fragments, the sim's
    # insert model) tiling the junction region — the fill verifier demands
    # a full-span pair for short fills, which 350 bp fragments provide
    bridge_reads = []
    for s in range(2600, 3300, 13):
        frag = g[s : s + 350]
        bridge_reads.append(frag[:150].copy())
        bridge_reads.append(dna.revcomp(frag[-150:]).copy())
    quals = [np.full(150, 37, np.uint8) for _ in bridge_reads]
    rs_gap = build_readset(
        bridge_reads, quals, np.zeros(len(bridge_reads) // 2, np.int32),
        n_barcodes=0, barcoded=False,
    )
    rp = pather.path_readset(bg, rs_gap)
    edges = np.asarray(rp.edges)[: rs_gap.n_reads]
    plen = np.asarray(rp.path_len)[: rs_gap.n_reads]
    dpaths, dlen = aplace.place_reads(D, edges, plen)

    # find the oriented lines spelling seg_a (forward) and seg_b (forward)
    sa = dna.codes_to_seq(seg_a)
    sb = dna.codes_to_seq(seg_b)
    la = lb = None
    line_seqs = {}
    for li in range(lines.n_lines):
        s = oph.line_sequence(D, lines.lines[li], {})
        line_seqs[li] = s
        if s == sa:
            la = li
        if s == sb:
            lb = li
    assert la is not None and lb is not None

    sc = Scaffold([la, lb], [100])
    n = astk.stackaroo(D, lines, [sc], rs_gap, dpaths, dlen, line_seqs)
    assert n == 1
    joined = oph.join_parts([line_seqs[la], line_seqs[lb]], sc)
    assert "N" not in joined
    assert joined == dna.codes_to_seq(g)


def test_pseudohap_busts_many_arm_cells():
    """Cells with >2 arms become separate records (BustMegabubble)."""
    from types import SimpleNamespace

    from supernova_tpu.asm.lines import Cell, Line
    from supernova_tpu.asm.scaffold import Scaffold

    seqs = {
        0: "A" * 60, 1: "C" * 60, 2: "G" * 60, 3: "T" * 60, 4: "AC" * 30,
    }
    D = SimpleNamespace(edge_seq=lambda d: seqs[int(d)])
    line = Line([
        Cell([np.array([0])]),
        Cell([np.array([1]), np.array([2]), np.array([3])]),  # 3 arms
        Cell([np.array([4])]),
    ])
    lines = SimpleNamespace(lines=[line])
    sc = Scaffold([0], [])
    from supernova_tpu.out.pseudohap import scaffold_records

    recs = scaffold_records(D, lines, sc, {}, 0)
    tags = [t for t, _ in recs]
    assert tags.count("bubble_arm") == 3
    assert tags[0] == "main" and tags[-1] == "main"
    assert recs[0][1] == "A" * 60
    assert recs[-1][1] == "AC" * 30


def test_fill_size_guard_rejects_repeat_flank_bridge():
    """A 400-base stack 'closure' of a {-2, 10000} gap contradicts the
    molecule evidence (the 10 Mb rung's ori-class defect) and is refused;
    fills consistent with the estimate pass, as do fills longer than it."""
    import numpy as np

    from supernova_tpu.asm.stackaroo import _fill_contradicts_estimate

    cal = lambda v: np.array([-2, v, 1])
    assert _fill_contradicts_estimate(400, cal(10_000))
    assert not _fill_contradicts_estimate(400, cal(3_000))
    assert not _fill_contradicts_estimate(9_000, cal(10_000))
    assert not _fill_contradicts_estimate(15_000, cal(10_000))
    # UNCALIBRATED star-time sizes are not trusted (judging against the
    # crude cap rejected mostly-good fills and made quality worse)
    assert not _fill_contradicts_estimate(400, np.array([-2, 10_000]))
    assert not _fill_contradicts_estimate(400, np.array([-2]))  # sizeless
    assert not _fill_contradicts_estimate(400, np.array([7, 8]))  # non-gap
