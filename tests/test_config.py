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


def test_addin_affects_behavior():
    """Overriding the kmer count min_freq constant changes the filter."""
    from supernova_tpu.kmer import count as kc

    prev = apply_addins({"kmer.count.MIN_FREQ": "5"})
    assert kc.MIN_FREQ == 5
    restore_addins(prev)
