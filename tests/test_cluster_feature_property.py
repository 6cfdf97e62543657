"""Property test: vectorized cluster featurization vs the reference's
per-site +-25 bp neighbor scan (hm_cluster_predict.py:130-154),
transcribed literally below."""

import numpy as np

from deepmod_tpu.tools.cluster_predict import NB_SIZE, build_cluster_features


def _reference_features(keys, frac):
    """Literal transcription of the cur_x construction loop."""
    out = []
    for (strand, pos) in keys:
        partner = ("-" if strand == "+" else "+",
                   pos + 1 if strand == "+" else pos - 1)
        cur_x = [frac[(strand, pos)],
                 frac.get(partner, 0)]
        for _ in range(11):
            cur_x.append(0)
        cur_x.append(0)
        # cur_x layout after this: [own, partner, 11 zero bins..., count]
        # matching the reference's index arithmetic: bins at 3..13 with
        # count at index 2 -> rebuild in that order below
        cur = [frac[(strand, pos)], frac.get(partner, 0), 0] + [0] * 11
        for rpos in range(pos - NB_SIZE, pos + NB_SIZE + 1):
            if rpos in (pos, partner[1]):
                continue
            if ("+", rpos) in frac:
                cur[int(frac[("+", rpos)] / 0.1 + 0.5) + 3] += 1
                cur[2] += 1
            elif ("-", rpos) in frac:
                cur[int(frac[("-", rpos)] / 0.1 + 0.5) + 3] += 1
                cur[2] += 1
        for i in range(3, len(cur)):
            if cur[2] > 0:
                cur[i] = round(cur[i] / float(cur[2]), 3)
        out.append(cur)
    return np.asarray(out, np.float32)


def test_cluster_features_match_reference_scan():
    rng = np.random.RandomState(5)
    # dense-ish CpG landscape with paired strands and gaps
    frac = {}
    pos = 100
    while pos < 3000:
        f = round(float(rng.randint(0, 101)) / 100.0, 3)
        if rng.rand() < 0.8:
            frac[("+", pos)] = f
        if rng.rand() < 0.8:
            frac[("-", pos + 1)] = round(float(rng.randint(0, 101)) / 100.0, 3)
        pos += rng.randint(2, 30)
    keys = sorted(frac.keys())
    got = build_cluster_features(keys, frac)
    want = _reference_features(keys, frac)
    np.testing.assert_allclose(got, want, atol=1e-6)
