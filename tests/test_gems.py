"""GEM-count / loading-mass / memory preflight estimators
(DfTools.cc:550-594 + alarms-supernova.json:17-36 analogues)."""
import math

import numpy as np

from supernova_tpu.stats import gems
from supernova_tpu.stats.logger import StatLogger


def _bci(rpb):
    """bci CSR from per-barcode read counts (barcode 0 = unbarcoded)."""
    return np.concatenate([[0, 0], np.cumsum(rpb)]).astype(np.int64)


def test_gem_count_occupancy_math():
    # 300 occupied barcodes (>= 4 reads each) of a 1000-barcode whitelist
    rpb = [10] * 300
    n = gems.estimate_gem_count(_bci(rpb), 1000)
    # the N99-cumulative gate trims the first ~1% of reads' barcodes
    expect = int(-math.log(1 - 300 / 1000) * 1000)
    assert abs(n - expect) <= 6
    # more GEMs than occupied barcodes (collisions accounted for)
    assert n > 300


def test_gem_count_disabled_and_degenerate():
    rpb = [10] * 300
    assert gems.estimate_gem_count(_bci(rpb), 0) == 0  # diversity unknown
    assert gems.estimate_gem_count(_bci([400]), 1) == 0  # fully occupied
    assert gems.estimate_gem_count(_bci([]), 1000) == 0  # no barcodes
    # all barcodes under the >=4 reads gate
    assert gems.estimate_gem_count(_bci([1, 2, 3]), 1000) == 0


def test_gem_count_n99_gate_drops_noise_barcodes():
    # 100 real barcodes with 1000 reads each + 5000 noise barcodes with 1
    # read: the N99-cumulative gate must not count the noise tail
    rpb = [1] * 5000 + [1000] * 100
    n = gems.estimate_gem_count(_bci(rpb), 10_000)
    expect = int(-math.log(1 - 100 / 10_000) * 10_000)
    assert abs(n - expect) <= expect * 0.25


class _Mol:
    def __init__(self, length):
        self.length = length


def test_loading_mass_scale():
    # 1M molecules x 50kb = 5e10 bp ~ 0.054 ng; 10M -> ~0.54 ng
    mols = [_Mol(50_000)] * 1000
    lm = gems.estimate_loading_mass_ng(mols)
    assert lm is not None
    per_mol = lm / 1000
    assert abs(per_mol * 1e6 / 0.054 - 1) < 0.05  # 1M mols ~ 0.054 ng
    assert gems.estimate_loading_mass_ng([]) is None


def test_mem_per_read():
    mpr = gems.mem_per_read_mb(1000)
    assert mpr is not None and mpr > 0
    assert gems.mem_per_read_mb(0) is None


def test_alert_envelope():
    st = StatLogger()
    st.log("mem_per_read", 0.00005)
    st.log("loading_mass", 0.01)
    fired = {a["stat"] for a in st.raised}
    assert {"mem_per_read", "loading_mass"} <= fired
    st2 = StatLogger()
    st2.log("mem_per_read", 0.01)
    st2.log("loading_mass", 1.2)
    assert not {"mem_per_read", "loading_mass"} & {
        a["stat"] for a in st2.raised
    }
