"""Orientation-aware scaffolding: junction tightness picks the right combo."""
import numpy as np
import pytest

from supernova_tpu.asm import scaffold as asc


def test_junction_tightness():
    # barcode molecules hugging a's end and b's start -> tight junction
    pos_a = {1: [900, 950], 2: [920]}
    pos_b = {1: [10, 60], 2: [30], 9: [500]}
    t, n = asc.junction_tightness(pos_a, pos_b, len_a=1000)
    assert n == 2
    assert t < 200
    # molecules at a's start instead -> loose
    pos_a_bad = {1: [10, 50], 2: [20]}
    t2, _ = asc.junction_tightness(pos_a_bad, pos_b, len_a=1000)
    assert t2 > t + 500


def test_scaffold_orientation_choice():
    from supernova_tpu.asm.lines import Line, Lines

    # two lines (plus rc twins); true layout: line0 END adjoins line2 START.
    lines = Lines(
        [Line([np.array([0])]), Line([np.array([1])]),
         Line([np.array([2])]), Line([np.array([3])])],
        np.array([0, 1, 2, 3]),
        np.array([1, 0, 3, 2]),  # 0<->1, 2<->3 rc pairs
    )
    line_lens = np.array([1000, 1000, 800, 800])
    # shared barcodes 5,6 bridge: near END of line0 and START of line2;
    # their mirrored twins (line1 start / line3 end) carry mirrored positions
    line_positions = {
        0: {5: [900], 6: [940], 7: [100]},
        1: {5: [100], 6: [60], 7: [900]},
        2: {5: [50], 6: [20], 8: [700]},
        3: {5: [750], 6: [780], 8: [100]},
    }
    line_bcs = [np.array([5, 6, 7]), np.array([5, 6, 7]),
                np.array([5, 6, 8]), np.array([5, 6, 8])]
    scaffolds = asc.scaffold_lines(
        lines, line_bcs, line_lens, min_shared=2,
        line_positions=line_positions,
    )
    joined = [s for s in scaffolds if len(s.line_ids) == 2]
    assert joined, "no join happened"
    ids = joined[0].line_ids
    # the chosen orientation must be (0 -> 2) or its global mirror (3 -> 1)
    assert ids in ([0, 2], [3, 1]), ids
