"""Mini-ABX evaluator tests: DTW properties, discriminable vs random
units, item-file plumbing through the CLI."""

import numpy as np
import pytest

from zerospeech_tts_tpu import eval as ev


def _coded_units(cls_bits, T, rng, flip=0.05, D=16):
    """Units whose class is encoded in a bit band, with noise flips."""
    u = np.zeros((T, D), np.int32)
    u[:, cls_bits] = 1
    noise = rng.random((T, D)) < flip
    return np.where(noise, 1 - u, u)


def test_dtw_properties():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 2, (7, 16))
    b = rng.integers(0, 2, (9, 16))
    assert ev.dtw_distance(a, a) == pytest.approx(0.0)
    dab, dba = ev.dtw_distance(a, b), ev.dtw_distance(b, a)
    assert dab == pytest.approx(dba)  # symmetric
    assert dab > 0
    # time-warped copy (frames repeated) stays near zero
    a2 = np.repeat(a, 2, axis=0)
    assert ev.dtw_distance(a, a2) == pytest.approx(0.0, abs=1e-9)


def _items(rng, coded=True):
    bands = {"p1": slice(0, 5), "p2": slice(5, 10), "p3": slice(10, 15)}
    items = []
    for cls, band in bands.items():
        for spk in ("s1", "s2"):
            for i in range(3):
                T = int(rng.integers(4, 9))
                u = (
                    _coded_units(band, T, rng)
                    if coded
                    else rng.integers(0, 2, (T, 16)).astype(np.int32)
                )
                items.append({"cls": cls, "spk": spk, "units": u})
    return items


def test_abx_discriminable_vs_random():
    rng = np.random.default_rng(1)
    good = ev.abx_discriminability(_items(rng, coded=True))
    assert good["abx"] > 0.95, good
    assert good["n_contexts"] > 0 and good["mode"] == "within-speaker"
    rand = ev.abx_discriminability(_items(rng, coded=False))
    assert 0.2 < rand["abx"] < 0.8, rand  # chance-ish
    across = ev.abx_discriminability(_items(rng, coded=True), across_speaker=True)
    assert across["abx"] > 0.9 and across["mode"] == "across-speaker"


def test_abx_item_file_and_cli(tmp_path, capsys):
    from zerospeech_tts_tpu.cli import main as cli_main
    from zerospeech_tts_tpu.convert import write_units

    rng = np.random.default_rng(2)
    units_dir = tmp_path / "units"
    lines = []
    bands = {"p1": slice(0, 5), "p2": slice(5, 10)}
    for cls, band in bands.items():
        for spk in ("s1", "s2"):
            for i in range(2):
                utt = f"{spk}_{cls}_{i}"
                write_units(units_dir / f"{utt}.txt", _coded_units(band, 8, rng))
                lines.append(f"{utt} 0 8 {cls} {spk}")
    item_file = tmp_path / "items.txt"
    item_file.write_text("# utt start end cls spk\n" + "\n".join(lines) + "\n")

    import json

    cli_main([
        "eval", "--platform", "cpu",
        "--units", str(units_dir),
        "--abx", str(item_file),
    ])
    rep = json.loads(capsys.readouterr().out)
    assert rep["abx"]["abx"] > 0.9
    assert rep["bitrate"]["n_utterances"] == 8


def test_abx_across_speaker_single_exemplars():
    """Across-speaker ABX must score contexts with ONE exemplar per
    (class, speaker) — a != x is only required within-speaker."""
    rng = np.random.default_rng(3)
    bands = {"p1": slice(0, 5), "p2": slice(5, 10)}
    items = [
        {"cls": cls, "spk": spk, "units": _coded_units(band, 8, rng)}
        for cls, band in bands.items()
        for spk in ("s1", "s2")
    ]
    rep = ev.abx_discriminability(items, across_speaker=True)
    assert rep["n_contexts"] > 0
    assert rep["abx"] > 0.9


def _u(*bits):
    return np.asarray([bits], np.int32)  # [1, D] unit snippet: DTW = Hamming


def test_abx_hierarchical_aggregation_hand_computed():
    """Official-hierarchy oracle, within-speaker: cell (A,B,s1) scores 1.0
    (both triples correct), cell (A,B,s2) scores 0.5 (one of two triples
    correct), no (B,A) cells (single B exemplar per speaker) -> ordered
    (A,B) = mean(1.0, 0.5) = 0.75 = the symmetrized pair = the headline."""
    items = [
        {"cls": "A", "spk": "s1", "units": _u(0, 0, 0, 0)},
        {"cls": "A", "spk": "s1", "units": _u(0, 0, 0, 1)},
        {"cls": "B", "spk": "s1", "units": _u(1, 1, 1, 1)},
        {"cls": "A", "spk": "s2", "units": _u(0, 0, 0, 0)},
        {"cls": "A", "spk": "s2", "units": _u(1, 1, 0, 0)},
        {"cls": "B", "spk": "s2", "units": _u(1, 1, 1, 0)},
    ]
    rep = ev.abx_discriminability(items)
    assert rep["abx"] == pytest.approx(0.75)
    assert rep["abx_error"] == pytest.approx(0.25)
    assert rep["n_class_pairs"] == 1
    assert rep["n_contexts"] == 2


def test_abx_across_speaker_uniform_cell_weighting():
    """Across-speaker contexts are (s_ab, s_x) CELLS with uniform weight,
    not a pooled x draw: s2 contributes two correct x's, s3 one wrong x.
    Uniform cell mean = (1.0 + 0.0)/2 = 0.5; pool-weighting would give 2/3."""
    items = [
        {"cls": "A", "spk": "s1", "units": _u(0, 0, 0, 0)},
        {"cls": "B", "spk": "s1", "units": _u(1, 1, 1, 1)},
        {"cls": "A", "spk": "s2", "units": _u(0, 0, 0, 0)},
        {"cls": "A", "spk": "s2", "units": _u(0, 0, 0, 1)},
        {"cls": "A", "spk": "s3", "units": _u(1, 1, 1, 0)},
    ]
    rep = ev.abx_discriminability(items, across_speaker=True)
    assert rep["abx"] == pytest.approx(0.5)
    assert rep["n_contexts"] == 2 and rep["n_class_pairs"] == 1


def _dtw_scalar(a, b):
    """Literal O(Ta*Tb) scalar DP — the oracle for the vectorized
    anti-diagonal sweep in eval.dtw_distance (same tie-break priority:
    diagonal, up, left)."""
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    ta, tb = a.shape[0], b.shape[0]
    d = np.abs(a[:, None, :] - b[None, :, :]).mean(axis=2)
    acc = np.full((ta + 1, tb + 1), np.inf)
    acc[0, 0] = 0.0
    steps = np.zeros((ta + 1, tb + 1), np.int32)
    for i in range(1, ta + 1):
        for j in range(1, tb + 1):
            best = min(acc[i - 1][j], acc[i][j - 1], acc[i - 1][j - 1])
            if best == acc[i - 1][j - 1]:
                steps[i, j] = steps[i - 1, j - 1] + 1
            elif best == acc[i - 1][j]:
                steps[i, j] = steps[i - 1, j] + 1
            else:
                steps[i, j] = steps[i, j - 1] + 1
            acc[i][j] = d[i - 1, j - 1] + best
    return float(acc[ta, tb] / max(int(steps[ta, tb]), 1))


def test_dtw_vectorized_matches_scalar_dp():
    rng = np.random.default_rng(5)
    for _ in range(20):
        ta, tb = int(rng.integers(1, 15)), int(rng.integers(1, 15))
        a = rng.integers(0, 2, (ta, 8))
        b = rng.integers(0, 2, (tb, 8))
        assert ev.dtw_distance(a, b) == pytest.approx(_dtw_scalar(a, b), abs=1e-12)
    # and a longer asymmetric pair
    a = rng.integers(0, 2, (60, 16))
    b = rng.integers(0, 2, (45, 16))
    assert ev.dtw_distance(a, b) == pytest.approx(_dtw_scalar(a, b), abs=1e-12)


def test_dtw_many_matches_per_pair():
    """The shape-grouped batched DTW (round 5: one sweep for the whole ABX
    run) must equal per-pair dtw_distance on every regime it routes:
    small binary groups (batched Hamming matmul + group DP), small
    NON-binary pairs (broadcast distance), and large pairs (>1024-cell
    grid: falls back to dtw_distance inside _dtw_many)."""
    rng = np.random.default_rng(9)
    pairs = []
    for _ in range(30):  # small binary, mixed shapes -> several groups
        ta, tb = int(rng.integers(2, 13)), int(rng.integers(2, 13))
        pairs.append((rng.integers(0, 2, (ta, 8)), rng.integers(0, 2, (tb, 8))))
    pairs.append((rng.standard_normal((5, 8)), rng.standard_normal((7, 8))))  # non-binary
    pairs.append((rng.integers(0, 2, (60, 16)), rng.integers(0, 2, (45, 16))))  # large
    # binary and non-binary pairs of the SAME shape: binary-ness must be
    # decided per pair, never per shape group (a mixed group on the float
    # path returns last-ulp-different values, and ABX ties compare exactly)
    pairs.append((rng.integers(0, 2, (6, 8)), rng.integers(0, 2, (9, 8))))
    pairs.append((rng.standard_normal((6, 8)), rng.standard_normal((9, 8))))
    got = ev._dtw_many(pairs)
    for g, (a, b) in zip(got, pairs):
        assert g == ev.dtw_distance(a, b), (a.shape, b.shape)  # bit-exact, not approx


def _rand_items(rng, n_classes=3, n_speakers=3, per_pool=3, dim=6):
    items = []
    for c in range(n_classes):
        for s in range(n_speakers):
            for _ in range(per_pool):
                t = int(rng.integers(2, 7))
                items.append({
                    "cls": f"c{c}", "spk": f"s{s}",
                    "units": rng.integers(0, 2, (t, dim)),
                })
    return items


def test_vectorized_cell_scoring_matches_scalar_loop():
    """The broadcast-compare cell scoring (round 4) must reproduce the
    scalar triple loop exactly — both within- and across-speaker, on
    random pools with real DTW ties (short binary snippets collide)."""
    rng = np.random.default_rng(11)
    items = _rand_items(rng)

    # oracle: run the aggregation with the scalar loop substituted in
    def abx_loop(items, across):
        from collections import defaultdict
        from itertools import product

        by = defaultdict(list)
        for it in items:
            by[(it["cls"], it["spk"])].append(np.asarray(it["units"]))
        classes = sorted({c for c, _ in by})
        speakers = sorted({s for _, s in by})
        dcache = {}

        def dist(u, v):
            key = (id(u), id(v))
            if key not in dcache:
                dcache[key] = dcache[(id(v), id(u))] = ev.dtw_distance(u, v)
            return dcache[key]

        pair_cells = defaultdict(list)
        for ca, cb in product(classes, classes):
            if ca == cb:
                continue
            for s in speakers:
                a_pool, b_pool = by.get((ca, s), []), by.get((cb, s), [])
                if not a_pool or not b_pool:
                    continue
                if across:
                    for s2 in speakers:
                        if s2 == s:
                            continue
                        sc = ev._cell_score_loop(
                            a_pool, b_pool, by.get((ca, s2), []), False, dist)
                        if sc is not None:
                            pair_cells[(ca, cb)].append(sc)
                else:
                    if len(a_pool) < 2:
                        continue
                    sc = ev._cell_score_loop(a_pool, b_pool, a_pool, True, dist)
                    if sc is not None:
                        pair_cells[(ca, cb)].append(sc)
        ordered = {p: float(np.mean(c)) for p, c in pair_cells.items()}
        sym = defaultdict(list)
        for (ca, cb), v in ordered.items():
            sym[tuple(sorted((ca, cb)))].append(v)
        return float(np.mean([float(np.mean(v)) for v in sym.values()]))

    for across in (False, True):
        got = ev.abx_discriminability(items, across_speaker=across)["abx"]
        want = round(abx_loop(items, across), 4)  # report rounds to 4 dp
        assert got == pytest.approx(want, abs=1e-12), (across, got, want)


def test_sampled_cell_scoring_close_and_seeded():
    """The max_triples_per_cell sampled path is (a) deterministic for a
    fixed seed and (b) statistically close to the exact score."""
    rng = np.random.default_rng(3)
    items = _rand_items(rng, n_classes=2, n_speakers=2, per_pool=8)
    exact = ev.abx_discriminability(items)["abx"]
    s1 = ev.abx_discriminability(items, max_triples_per_cell=100, seed=7)["abx"]
    s2 = ev.abx_discriminability(items, max_triples_per_cell=100, seed=7)["abx"]
    assert s1 == s2
    assert abs(s1 - exact) < 0.1, (s1, exact)
