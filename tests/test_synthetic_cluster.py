"""Cluster-correlated methylation landscape in the synthetic generator.

Supports the cluster-effect value loop (scripts/validate_cluster_loop.py):
per-CpG-dyad methylation probabilities with spatial (tile) correlation,
applied per read as independent Bernoulli draws on either strand —
the partial-methylation structure hm_cluster_predict.py:130-154 exploits.
"""

import numpy as np

from deepmod_tpu.testing.synthetic import (
    SynthConfig,
    _site_prob_mask,
    make_clustered_site_prob,
    make_genome,
    simulate_read,
)


def test_clustered_site_prob_structure():
    rng = np.random.RandomState(5)
    genome = make_genome(rng, {"chrC": 30000})
    probs = make_clustered_site_prob(rng, genome, tile=200)
    arr = probs["chrC"]
    seq = genome["chrC"]
    dyads = [i for i in range(len(seq) - 1) if seq[i : i + 2] == "CG"]
    assert len(dyads) > 100
    # probability only at dyad C positions
    nz = np.flatnonzero(arr)
    assert set(nz) == set(dyads)
    # bimodal: every site in one of the two configured ranges
    vals = arr[nz]
    assert (((vals >= 0.7) & (vals <= 0.95))
            | ((vals >= 0.02) & (vals <= 0.15))).all()
    # tile correlation: sites in one tile share a state
    states = vals >= 0.5
    tiles = nz // 200
    for t in np.unique(tiles):
        ts = states[tiles == t]
        assert ts.all() or (~ts).all()
    # both states occur
    assert states.any() and (~states).any()


def test_simulate_read_ref_pos_mapping():
    rng = np.random.RandomState(7)
    genome = make_genome(rng, {"chrC": 20000})
    cfg = SynthConfig(genome_sizes={"chrC": 20000}, read_length=(800, 1200))

    for _ in range(10):
        chrom, strand, start, segment, seq, ref_pos = simulate_read(
            rng, genome, cfg, return_ref_pos=True
        )
        assert len(ref_pos) == len(seq)
        ins = ref_pos < 0
        assert ins.mean() < 0.03
        # non-inserted, non-substituted bases must match the genome
        # (strand-aware); substitutions are ~1%
        gp = ref_pos[~ins]
        bases = np.asarray(list(seq))[~ins]
        ref_bases = np.asarray(list(genome[chrom]))[gp]
        if strand == "-":
            comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
            ref_bases = np.asarray([comp[b] for b in ref_bases])
        match = (bases == ref_bases).mean()
        assert match > 0.97, (strand, match)


def test_site_prob_mask_strands():
    genome_seq = "AACGTTACGGA"  # dyads at + strand C: pos 2, 7
    probs = np.zeros(len(genome_seq))
    probs[2] = 1.0  # dyad CG at 2-3 always methylated
    probs[7] = 0.0  # dyad CG at 7-8 never
    rng = np.random.RandomState(0)
    # + strand read covering everything, no errors
    ref_pos = np.arange(len(genome_seq))
    mask = _site_prob_mask(rng, genome_seq, probs, "+", ref_pos)
    assert mask[2] and not mask[7] and mask.sum() == 1
    # - strand read: template index t maps to genome pos L-1-t; the
    # minus-strand C sits on the G (genome pos 3 and 8)
    L = len(genome_seq)
    ref_pos_minus = L - 1 - np.arange(L)
    mask_m = _site_prob_mask(rng, genome_seq, probs, "-", ref_pos_minus)
    hit = np.flatnonzero(mask_m)
    assert list(ref_pos_minus[hit]) == [3]


def test_generate_dataset_with_landscape(tmp_path):
    from deepmod_tpu.io.fast5 import read_fast5_file
    from deepmod_tpu.testing.synthetic import generate_dataset

    rng = np.random.RandomState(11)
    genome = make_genome(rng, {"chrC": 15000})
    probs = make_clustered_site_prob(rng, genome, tile=200)
    cfg = SynthConfig(
        genome_sizes={"chrC": 15000}, num_reads=4, seed=3,
        read_length=(800, 1200),
        mod_site_prob=probs, mod_level_shift=1.0,
    )
    _, reads = generate_dataset(str(tmp_path), cfg, genome=genome)
    assert len(reads) == 4
    for r in reads:
        fr = read_fast5_file(r.path)
        assert len(fr.m_event) > 100
