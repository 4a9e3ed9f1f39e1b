"""Counting parity vs a brute-force python model of the reference rules
(Kmerizer/areEnoughBarcodes/recomputeAdjacencies — BuildReadQGraph48.cc)."""
import numpy as np
import pytest

from supernova_tpu.core import dna
from supernova_tpu.core.kmer_codec import K, words_from_codes_np
from supernova_tpu.ingest.ingest import ingest_sim
from supernova_tpu.kmer import count as kcount
from supernova_tpu.sim import genome as sim


def brute_trim(quals, min_qual=7):
    good = 0
    for i in range(len(quals) - 1, -1, -1):
        if quals[i] < min_qual:
            good = 0
        else:
            good += 1
            if good == K:
                return i + K
    return 0


def rev4(m):
    return ((m & 1) << 3) | ((m & 2) << 1) | ((m & 4) >> 1) | ((m & 8) >> 3)


def brute_count(rs, min_freq=3, min_bc=2, min_qual=7):
    table = {}
    for i in range(rs.n_reads):
        r, q = rs.read(i), rs.qual(i)
        glen = brute_trim(q, min_qual)
        if glen < K + 1:
            continue
        bc = int(rs.bc[i]) if (rs.barcoded and rs.bc[i] > 0) else -1
        for p in range(glen - K + 1):
            fwd = dna.codes_to_seq(r[p : p + K])
            rcs = dna.codes_to_seq(dna.revcomp(r[p : p + K]))
            canon, flipped = (rcs, True) if rcs < fwd else (fwd, False)
            lm = (1 << r[p - 1]) if p > 0 else 0
            rm = (1 << r[p + K]) if p + K < glen else 0
            if flipped:
                lm, rm = rev4(rm), rev4(lm)
            ent = table.setdefault(canon, [0, set(), False, 0, 0])
            ent[0] += 1
            if bc == -1:
                ent[2] = True
            else:
                ent[1].add(bc)
            ent[3] |= int(lm)
            ent[4] |= int(rm)
    kept = {
        k: v
        for k, v in table.items()
        if v[0] >= min_freq and (v[2] or len(v[1]) >= min_bc)
    }
    # recomputeAdjacencies: drop context bits pointing outside the table
    def canon_str(s):
        rc = dna.codes_to_seq(dna.revcomp(dna.seq_to_codes(s)))
        return min(s, rc)

    for k, v in kept.items():
        lm2 = rm2 = 0
        for b in range(4):
            succ = k[1:] + "ACGT"[b]
            if canon_str(succ) in kept:
                rm2 |= 1 << b
            pred = "ACGT"[b] + k[:-1]
            if canon_str(pred) in kept:
                lm2 |= 1 << b
        v[3] &= lm2
        v[4] &= rm2
    return kept


def small_readset(rng, **kw):
    g = sim.random_genome(rng, 3000)
    _, hb = sim.diploidize(rng, g, het_rate=0.002)
    wl = sim.make_whitelist(rng, 64)
    reads = sim.simulate_linked_reads(
        rng,
        (g, hb),
        wl,
        n_barcodes=12,
        molecules_per_barcode=2,
        molecule_len=1500,
        coverage_per_molecule=1.2,
        **kw,
    )
    return ingest_sim(reads, wl)


def table_to_dict(table):
    n = int(table.n_valid)
    from supernova_tpu.core.kmer_codec import soa_to_np

    words = soa_to_np(table.words)[:n]
    out = {}
    for i in range(n):
        from supernova_tpu.core.kmer_codec import codes_from_words_np

        key = dna.codes_to_seq(codes_from_words_np(words[i]))
        out[key] = (
            int(np.asarray(table.count)[i]),
            int(np.asarray(table.nbc)[i]),
            int(np.asarray(table.left_mask)[i]),
            int(np.asarray(table.right_mask)[i]),
        )
    return out


def test_good_lengths_matches_rust_rule(rng):
    import jax.numpy as jnp

    lens = rng.integers(40, 160, size=30)
    quals = [rng.choice([2, 11, 37], size=l, p=[0.1, 0.2, 0.7]) for l in lens]
    flat = np.concatenate(quals).astype(np.int32)
    offsets = np.zeros(len(lens) + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    pos_read = np.repeat(np.arange(len(lens), dtype=np.int32), lens)
    got = np.asarray(
        kcount.good_lengths(jnp.asarray(flat), jnp.asarray(offsets), jnp.asarray(pos_read))
    )
    expect = np.array([brute_trim(q) for q in quals])
    assert np.array_equal(got[: len(lens)], expect)


def test_count_matches_bruteforce(rng):
    rs = small_readset(rng, error_rate=0.003)
    table = kcount.count_readset(rs)
    got = table_to_dict(table)
    expect = brute_count(rs)
    assert set(got) == set(expect)
    for k, (cnt, nbc, lm, rm) in got.items():
        e = expect[k]
        assert cnt == e[0], k
        assert lm == e[3] and rm == e[4], k
        if not e[2]:  # nbc only meaningful when counted
            assert nbc >= min(len(e[1]), 2) or nbc == len(e[1])


def test_table_sorted_and_deterministic(rng):
    rs = small_readset(rng)
    t1 = kcount.count_readset(rs)
    t2 = kcount.count_readset(rs)
    n = int(t1.n_valid)
    from supernova_tpu.core.kmer_codec import soa_to_np

    w = soa_to_np(t1.words)[:n]
    keys = [tuple(r) for r in w.tolist()]
    assert keys == sorted(keys) and len(set(keys)) == n
    assert np.array_equal(soa_to_np(t1.words), soa_to_np(t2.words))
    assert np.array_equal(np.asarray(t1.count), np.asarray(t2.count))


def test_unbarcoded_dataset_passes_bc_filter(rng):
    rs = small_readset(rng)
    rs.barcoded = False
    table = kcount.count_readset(rs)
    got = table_to_dict(table)
    rs.barcoded = True
    expect = brute_count(rs)
    # unbarcoded: every kmer with count>=3 passes (ignored-barcode rule),
    # which is a superset of the barcoded filter
    assert set(expect) <= set(got)


def test_uniform_tail_cut_matches_general_path(rng):
    """count_kmers' static tail cut (uniform_rl) must produce the same
    table as the general padded path on identical reads."""
    rs = small_readset(rng, error_rate=0.002)
    inp = kcount.prepare_reads(rs)
    assert inp["uniform_rl"] is not None  # sim reads are uniform length
    args = (inp["codes_ext"], inp["pos_read"], inp["glen_pos"], inp["bc_pos"])
    t_cut = kcount.count_kmers(*args, uniform_rl=inp["uniform_rl"])
    t_gen = kcount.count_kmers(*args, uniform_rl=None)
    n1, n2 = int(t_cut.n_valid), int(t_gen.n_valid)
    assert n1 == n2
    for f in ("count", "nbc", "left_mask", "right_mask"):
        assert np.array_equal(
            np.asarray(getattr(t_cut, f))[:n1], np.asarray(getattr(t_gen, f))[:n2]
        ), f
    from supernova_tpu.core.kmer_codec import soa_to_np

    assert np.array_equal(soa_to_np(t_cut.words)[:n1], soa_to_np(t_gen.words)[:n2])


def test_nonuniform_reads_skip_the_cut(rng):
    from supernova_tpu.ingest.reads import build_readset

    g = rng.integers(0, 4, 4000, dtype=np.uint8)
    reads, quals, bcs = [], [], []
    for i in range(60):
        ln = int(rng.integers(80, 151))
        s = int(rng.integers(0, len(g) - ln))
        reads.append(g[s : s + ln].copy())
        quals.append(np.full(ln, 37, np.uint8))
        bcs.append(1 + i % 7)
    rs = build_readset(reads, quals, np.asarray(bcs), n_barcodes=8)
    inp = kcount.prepare_reads(rs)
    assert inp["uniform_rl"] is None
    table = kcount.count_readset(rs, min_freq=1, min_bc=1)
    assert int(table.n_valid) > 0


def test_good_lengths_np_sparse_matches_brute(rng):
    """Sparse O(reads + bads) qual trim == the per-base brute rule."""
    for trial in range(10):
        n = int(rng.integers(1, 40))
        lens = rng.integers(1, 200, n)
        offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
        quals = np.full(int(offsets[-1]), 37, np.uint8)
        nbad = int(rng.integers(0, 60))
        if offsets[-1] and nbad:
            quals[rng.integers(0, offsets[-1], nbad)] = 2
        got = kcount.good_lengths_np(quals, offsets)
        want = np.array(
            [brute_trim(quals[offsets[i]: offsets[i + 1]]) for i in range(n)],
            np.int32,
        )
        assert np.array_equal(got, want), trial
