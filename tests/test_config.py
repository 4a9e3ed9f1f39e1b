"""Heuristic addin overrides (SURVEY §5.6 tier 3)."""
import pytest

from supernova_tpu.core.config import apply_addins, parse_addin_args, restore_addins


def test_apply_and_restore():
    from supernova_tpu.asm import nucleate

    old = nucleate.MIN_OVER_BASES
    prev = apply_addins({"asm.nucleate.MIN_OVER_BASES": "150"})
    assert nucleate.MIN_OVER_BASES == 150 and prev == {
        "asm.nucleate.MIN_OVER_BASES": old
    }
    restore_addins(prev)
    assert nucleate.MIN_OVER_BASES == old


def test_type_coercion_and_validation():
    from supernova_tpu.asm import scaffold

    prev = apply_addins({"supernova_tpu.asm.scaffold.ADVANTAGE": "3.5"})
    assert scaffold.ADVANTAGE == 3.5
    restore_addins(prev)
    with pytest.raises(AttributeError):
        apply_addins({"asm.scaffold.NO_SUCH_CONST": "1"})
    with pytest.raises(ValueError):
        apply_addins({"asm.scaffold.shared_count": "1"})  # not UPPER_CASE
    with pytest.raises(ValueError):
        parse_addin_args(["missing_equals"])


def test_addin_affects_behavior(rng):
    """Overriding kmer.count.MIN_FREQ actually changes the filter output
    (constants must be read at CALL time, not bound as defaults)."""
    import numpy as np

    from supernova_tpu.ingest.ingest import ingest_sim
    from supernova_tpu.kmer import count as kc
    from supernova_tpu.sim import genome as sim

    g = sim.random_genome(rng, 4000)
    _, hb = sim.diploidize(rng, g, 0.001)
    wl = sim.make_whitelist(rng, 64)
    reads = sim.simulate_linked_reads(
        rng, (g, hb), wl, n_barcodes=30, molecules_per_barcode=2,
        molecule_len=2000, coverage_per_molecule=2.5,
    )
    rs = ingest_sim(reads, wl)
    base = int(kc.count_readset(rs).n_valid)
    prev = apply_addins({"kmer.count.MIN_FREQ": "9"})
    try:
        strict = int(kc.count_readset(rs).n_valid)
    finally:
        restore_addins(prev)
    assert strict < base
