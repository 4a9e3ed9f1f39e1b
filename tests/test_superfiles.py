"""SuperFiles final/a.sup* family: write + load round trip."""
import numpy as np

from supernova_tpu.out import superfiles as osf


def test_lines_encode_decode_roundtrip():
    from supernova_tpu.asm.lines import Cell, Line, Lines

    lines = Lines(
        lines=[
            Line([Cell([np.array([0])]), Cell([np.array([2]), np.array([4, 6])])]),
            Line([Cell([np.array([1])])]),
        ],
        line_of_edge=np.array([0, 1, 0, -1, 0, -1, 0]),
        linv=np.array([1, 0]),
    )
    z = osf.encode_lines(lines)
    back = osf.decode_lines(z)
    assert back.n_lines == 2
    assert np.array_equal(back.linv, lines.linv)
    assert np.array_equal(back.line_of_edge, lines.line_of_edge)
    for a, b in zip(lines.lines, back.lines):
        assert len(a.elements) == len(b.elements)
        for ca, cb in zip(a.elements, b.elements):
            assert len(ca.paths) == len(cb.paths)
            for pa, pb in zip(ca.paths, cb.paths):
                assert np.array_equal(pa, pb)


def test_super_files_roundtrip(tmp_path, rng):
    """End-to-end: build a small assembly, write final/, load it back."""
    from supernova_tpu.asm import lines as alines
    from supernova_tpu.asm import supergraph as asg
    from supernova_tpu.dbg import build as dbuild
    from supernova_tpu.dbg import graph as dgraph
    from supernova_tpu.kmer import count as kcount
    from supernova_tpu.sim import genome as sim
    from tests.test_dbg import perfect_readset

    g = sim.random_genome(rng, 2000)
    rs = perfect_readset(g)
    table = dbuild.trim_table(kcount.count_readset(rs, min_freq=2), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    D = asg.build_supergraph(bg)
    lines = alines.find_lines(D)
    from supernova_tpu.asm.phasing import Bubble, LinePhasing

    cell0 = lines.lines[0].elements[0]
    phasings = {
        0: LinePhasing(
            [Bubble(0, list(cell0.paths))],
            np.array([1]), [(0, 1)], 3.0,
        )
    }

    final = osf.write_super_files(
        tmp_path, D, lines, phasings=phasings,
        lbpx=[(0, 5, 100), (0, 7, 250)],
    )
    assert (final / "a.sup.npz").exists()
    assert (final / "a.sup.fastb.npz").exists()

    back = osf.load_super_files(tmp_path, bg)
    D2, lines2 = back["D"], back["lines"]
    assert D2.n_edges == D.n_edges
    assert np.array_equal(D2.dinv, D.dinv)
    assert np.array_equal(D2.epaths.values, D.epaths.values)
    assert lines2.n_lines == lines.n_lines
    assert np.array_equal(back["llens"], lines.lengths(D))
    assert back["lbpx"] == [(0, 5, 100), (0, 7, 250)]
    p0 = back["phasings"][0]
    assert np.array_equal(p0.x, phasings[0].x)
    assert p0.blocks == phasings[0].blocks
    assert p0.score == phasings[0].score
    assert [b.element_idx for b in p0.bubbles] == [0]
    # fastb rows spell the D edges
    fz = np.load(final / "a.sup.fastb.npz")
    offs = fz["offsets"]
    for d in range(D.n_edges):
        row = fz["values"][offs[d] : offs[d + 1]]
        assert np.array_equal(row, D.edge_bases(d).astype(np.uint8))
