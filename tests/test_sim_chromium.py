"""Chromium-realistic simulator statistics (VERDICT r3 #5).

The reference's GEM envelope (alarms-supernova.json:100-112; SURVEY.md §0):
molecules 50-100 kb sampled sparsely (0.1-0.3x each), ~10 molecules per
barcode, reads-per-barcode N50 ~1000.  The `chromium_model=True` regime of
sim.simulate_linked_reads must land inside that envelope — phasing,
molecule inference, and scaffolding are validated against THIS data model.
"""
import numpy as np

from supernova_tpu.sim import genome as sim


def _simulate(n_barcodes=120, genome=400_000):
    rng = np.random.default_rng(3)
    g = sim.random_genome(rng, genome, n_repeat_chunks=4)
    _, hb = sim.diploidize(rng, g, het_rate=0.001)
    wl = sim.make_whitelist(rng, 4 * n_barcodes)
    reads = sim.simulate_linked_reads(
        rng, (g, hb), wl, n_barcodes=n_barcodes,
        molecules_per_barcode=10, molecule_len=60_000,
        coverage_per_molecule=0.2, chromium_model=True,
    )
    return reads


def test_reads_per_barcode_envelope():
    reads = _simulate()
    packed = sim.pack_bc(np.stack(reads.barcode))
    _, counts = np.unique(packed, return_counts=True)
    counts = np.sort(counts * 2)[::-1]  # pairs -> reads
    # rpb N50: reads in barcodes at/above the half-mass point
    half = counts.sum() / 2
    n50 = counts[np.searchsorted(np.cumsum(counts), half)]
    assert 200 <= n50 <= 4_000, n50  # envelope: ~1000, exit >10k


def test_molecule_sampling_is_sparse():
    """Mean spacing between consecutive read starts of one barcode within
    a molecule must reflect ~0.2x sampling (~1.5 kb between pair starts),
    not the dense 2x regime (~150 b)."""
    reads = _simulate()
    packed = sim.pack_bc(np.stack(reads.barcode))
    pos = np.asarray(reads.truth_pos)
    spacings = []
    for b in np.unique(packed)[:40]:
        p = np.sort(pos[packed == b])
        d = np.diff(p)
        # within-molecule spacings only (molecule breaks are >50 kb)
        spacings.extend(d[(d > 0) & (d < 20_000)].tolist())
    med = np.median(spacings)
    assert 400 <= med <= 5_000, med


def test_molecule_lengths_exponential_tail():
    """Inferred per-barcode spans: with exponential 60 kb molecules some
    spans must far exceed the old fixed 20 kb cap, and the spread must be
    wide (CV >> fixed-length's ~0).  Few molecules per barcode on a large
    genome so same-barcode molecules rarely overlap and the 50 kb gap
    split recovers individual molecules."""
    rng = np.random.default_rng(9)
    g = sim.random_genome(rng, 2_000_000)
    wl = sim.make_whitelist(rng, 512)
    reads = sim.simulate_linked_reads(
        rng, (g, g), wl, n_barcodes=128, molecules_per_barcode=3,
        molecule_len=60_000, coverage_per_molecule=0.2,
        chromium_model=True,
    )
    packed = sim.pack_bc(np.stack(reads.barcode))
    pos = np.asarray(reads.truth_pos)
    spans = []
    for b in np.unique(packed):
        p = np.sort(pos[packed == b])
        breaks = np.nonzero(np.diff(p) > 50_000)[0]
        lo = 0
        for hi in list(breaks + 1) + [len(p)]:
            if hi - lo >= 3:
                spans.append(p[hi - 1] - p[lo])
            lo = hi
    spans = np.asarray(spans)
    assert (spans > 40_000).sum() >= 5, "no long molecules"
    assert spans.std() / max(spans.mean(), 1) > 0.5, "not dispersed"


def test_dense_model_unchanged():
    """chromium_model=False keeps the legacy fixed-length behavior that
    the focused unit tests rely on."""
    rng = np.random.default_rng(0)
    g = sim.random_genome(rng, 20_000)
    wl = sim.make_whitelist(rng, 64)
    reads = sim.simulate_linked_reads(
        rng, (g, g), wl, n_barcodes=10, molecules_per_barcode=2,
        molecule_len=4_000, coverage_per_molecule=2.0,
    )
    packed = sim.pack_bc(np.stack(reads.barcode))
    pos = np.asarray(reads.truth_pos)
    for b in np.unique(packed):
        p = np.sort(pos[packed == b])
        assert len(p) >= 10  # dense sampling: many pairs per molecule
