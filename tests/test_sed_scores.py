"""SED metric tests: collar matching, zero-score handling, segment grids.

Hand-built cases with known tp/fp/fn, following the sed_eval definitions
the reference depends on (evaluation_measures.py:124-182: t_collar 200 ms,
offset collar max(200 ms, 20 % length), 1 s segments)."""

import numpy as np
import pandas as pd

from dcase2019_task4_tpu.eval.sed_scores import (
    compute_strong_metrics,
    event_based_metrics,
    segment_based_metrics,
)


def _df(rows):
    return pd.DataFrame(rows, columns=["filename", "onset", "offset", "event_label"])


def test_exact_match_perfect_f1():
    ref = _df([("a.wav", 1.0, 2.0, "Dog")])
    est = _df([("a.wav", 1.0, 2.0, "Dog")])
    m = event_based_metrics(ref, est)
    assert m.macro_f_measure() == 1.0


def test_onset_collar_boundary():
    ref = _df([("a.wav", 1.0, 2.0, "Dog")])
    inside = _df([("a.wav", 1.19, 2.0, "Dog")])
    outside = _df([("a.wav", 1.25, 2.0, "Dog")])
    assert event_based_metrics(ref, inside).macro_f_measure() == 1.0
    assert event_based_metrics(ref, outside).macro_f_measure() == 0.0


def test_offset_collar_percentage_of_length():
    # 10 s event → offset collar max(0.2, 0.2·10) = 2 s
    ref = _df([("a.wav", 0.0, 10.0, "Dog")])
    est = _df([("a.wav", 0.0, 8.5, "Dog")])
    assert event_based_metrics(ref, est).macro_f_measure() == 1.0
    est2 = _df([("a.wav", 0.0, 7.5, "Dog")])
    assert event_based_metrics(ref, est2).macro_f_measure() == 0.0


def test_one_to_one_matching():
    # two identical system events can't both match one reference event
    ref = _df([("a.wav", 1.0, 2.0, "Dog")])
    est = _df([("a.wav", 1.0, 2.0, "Dog"), ("a.wav", 1.05, 2.05, "Dog")])
    m = event_based_metrics(ref, est)
    cc = m.counts["Dog"]
    assert cc.tp == 1 and cc.n_sys == 2 and cc.n_ref == 1
    # P=0.5, R=1 → F=2/3
    np.testing.assert_allclose(m.macro_f_measure(), 2 / 3)


def test_bipartite_matching_optimal():
    # both pairings are achievable here, so greedy and bipartite agree (tp=2)
    ref = _df([("a.wav", 1.0, 2.0, "Dog"), ("a.wav", 1.1, 2.1, "Dog")])
    est = _df([("a.wav", 1.1, 2.1, "Dog"), ("a.wav", 0.95, 1.95, "Dog")])
    assert event_based_metrics(ref, est).counts["Dog"].tp == 2
    assert event_based_metrics(ref, est, matching="bipartite").counts["Dog"].tp == 2


def test_greedy_differs_from_bipartite_adversarial():
    """Adversarial case where sed_eval's greedy first-fit pairing is
    sub-optimal: ref0 hits both system events and greedily takes est0 (row
    order), stranding ref1 (which only hits est0). The official sed_eval
    number is tp=1 — the default must reproduce IT, not the optimum."""
    ref = _df([("a.wav", 1.0, 2.0, "Dog"), ("a.wav", 1.25, 2.25, "Dog")])
    est = _df([("a.wav", 1.1, 2.1, "Dog"), ("a.wav", 0.85, 1.85, "Dog")])
    greedy = event_based_metrics(ref, est)  # default = sed_eval-exact
    assert greedy.counts["Dog"].tp == 1
    optimal = event_based_metrics(ref, est, matching="bipartite")
    assert optimal.counts["Dog"].tp == 2


def test_greedy_first_fit_order_sensitivity():
    """Greedy matches in estimated-list ROW order, not best-fit: est0 is a
    worse time match than est1 for ref0 but comes first, so it wins."""
    ref = _df([("a.wav", 1.0, 2.0, "Dog")])
    est = _df([("a.wav", 1.15, 2.15, "Dog"), ("a.wav", 1.0, 2.0, "Dog")])
    m = event_based_metrics(ref, est)
    cc = m.counts["Dog"]
    assert cc.tp == 1 and cc.n_sys == 2  # P=0.5, R=1


def test_event_error_rate_substitution():
    # time-matched but label-mismatched pair = one substitution: ER = 1/N,
    # with D = I = 0 (sed_eval's event-based error-rate decomposition)
    ref = _df([("a.wav", 1.0, 2.0, "Dog")])
    est = _df([("a.wav", 1.0, 2.0, "Cat")])
    ov = event_based_metrics(ref, est).results_overall_metrics()
    er = ov["error_rate"]
    np.testing.assert_allclose(er["substitution_rate"], 1.0)
    np.testing.assert_allclose(er["deletion_rate"], 0.0)
    np.testing.assert_allclose(er["insertion_rate"], 0.0)
    np.testing.assert_allclose(er["error_rate"], 1.0)


def test_event_error_rate_deletion_insertion():
    # one matched Dog, one missed Dog (deletion), one spurious far-away Cat
    # (insertion, no time overlap → not a substitution)
    ref = _df([("a.wav", 1.0, 2.0, "Dog"), ("a.wav", 5.0, 6.0, "Dog")])
    est = _df([("a.wav", 1.0, 2.0, "Dog"), ("a.wav", 8.0, 9.0, "Cat")])
    ov = event_based_metrics(ref, est).results_overall_metrics()
    er = ov["error_rate"]
    np.testing.assert_allclose(er["substitution_rate"], 0.0)
    np.testing.assert_allclose(er["deletion_rate"], 0.5)  # 1 of N=2
    np.testing.assert_allclose(er["insertion_rate"], 0.5)
    np.testing.assert_allclose(er["error_rate"], 1.0)


def test_segment_error_rate_decomposition():
    # segments 0,1 tp; segment 2: ref Dog active, est Cat active → S=1;
    # segment 3: est-only Cat → I=1. N = 3 active ref segments.
    ref = _df([("a.wav", 0.0, 3.0, "Dog")])
    est = _df([("a.wav", 0.0, 2.0, "Dog"), ("a.wav", 2.0, 4.0, "Cat")])
    ov = segment_based_metrics(ref, est, 1.0).results_overall_metrics()
    er = ov["error_rate"]
    np.testing.assert_allclose(er["substitution_rate"], 1 / 3)
    np.testing.assert_allclose(er["deletion_rate"], 0.0)
    np.testing.assert_allclose(er["insertion_rate"], 1 / 3)
    np.testing.assert_allclose(er["error_rate"], 2 / 3)


def test_wrong_class_no_match():
    ref = _df([("a.wav", 1.0, 2.0, "Dog")])
    est = _df([("a.wav", 1.0, 2.0, "Cat")])
    m = event_based_metrics(ref, est)
    # classes = {Dog, Cat}; Dog: fn, Cat: fp → both F=0
    assert m.macro_f_measure() == 0.0


def test_empty_system_zero_score():
    ref = _df([("a.wav", 1.0, 2.0, "Dog"), ("a.wav", 3.0, 4.0, "Cat")])
    est = _df([("a.wav", 1.0, 2.0, "Dog")])
    m = event_based_metrics(ref, est)
    assert m.counts["Dog"].f_measure == 1.0
    assert m.counts["Cat"].f_measure == 0.0
    np.testing.assert_allclose(m.macro_f_measure(), 0.5)


def test_macro_average_across_files():
    ref = _df([("a.wav", 0.0, 1.0, "Dog"), ("b.wav", 0.0, 1.0, "Dog")])
    est = _df([("a.wav", 0.0, 1.0, "Dog")])
    m = event_based_metrics(ref, est)
    cc = m.counts["Dog"]
    assert cc.tp == 1 and cc.n_ref == 2 and cc.n_sys == 1
    # P=1, R=0.5 → F=2/3
    np.testing.assert_allclose(m.macro_f_measure(), 2 / 3)


def test_segment_based_basic():
    ref = _df([("a.wav", 0.0, 3.0, "Dog")])
    est = _df([("a.wav", 0.0, 2.0, "Dog")])
    m = segment_based_metrics(ref, est, 1.0)
    cc = m.counts["Dog"]
    assert cc.tp == 2 and cc.n_ref == 3 and cc.n_sys == 2
    # P=1, R=2/3 → F = 0.8
    np.testing.assert_allclose(cc.f_measure, 0.8)


def test_segment_partial_overlap_activates_segment():
    ref = _df([("a.wav", 0.5, 1.2, "Dog")])  # touches segments 0 and 1
    est = _df([("a.wav", 0.9, 1.1, "Dog")])
    m = segment_based_metrics(ref, est, 1.0)
    cc = m.counts["Dog"]
    assert cc.n_ref == 2 and cc.n_sys == 2 and cc.tp == 2


def test_compute_strong_metrics_returns_event_metrics():
    ref = _df([("a.wav", 1.0, 2.0, "Dog")])
    est = _df([("a.wav", 1.0, 2.0, "Dog")])
    m = compute_strong_metrics(est, ref)
    assert m.results_class_wise_average_metrics()["f_measure"]["f_measure"] == 1.0
    assert "macro F1" in str(m)


def test_matching_vs_bruteforce_property():
    """Property test: the augmenting-path matcher equals brute-force optimal
    1-1 matching on random small event sets."""
    import itertools

    from dcase2019_task4_tpu.eval.sed_scores import _max_matching

    rng = np.random.default_rng(0)
    for _ in range(200):
        n_ref = int(rng.integers(0, 5))
        n_est = int(rng.integers(0, 5))
        hits = rng.random((n_ref, n_est)) < 0.4
        got = _max_matching(hits)
        best = 0
        if n_ref and n_est:
            for perm in itertools.permutations(range(n_est), min(n_ref, n_est)):
                rows = range(min(n_ref, n_est))
                best = max(best, sum(1 for r, e in zip(rows, perm) if hits[r, e]))
            # also try all row subsets when n_ref > n_est handled by perm over est
            for rows in itertools.permutations(range(n_ref), min(n_ref, n_est)):
                for perm in itertools.permutations(range(n_est), min(n_ref, n_est)):
                    best = max(best, sum(1 for r, e in zip(rows, perm) if hits[r, e]))
        assert got == best, (hits, got, best)


def test_event_metrics_random_selfmatch():
    """Any prediction set scored against itself is a perfect match."""
    rng = np.random.default_rng(1)
    rows = []
    for i in range(30):
        on = rng.uniform(0, 8)
        rows.append((f"f{i % 5}.wav", on, on + rng.uniform(0.3, 2.0),
                     f"c{int(rng.integers(0, 3))}"))
    df = _df(rows)
    m = event_based_metrics(df, df.copy())
    assert m.macro_f_measure() == 1.0
    s = segment_based_metrics(df, df.copy())
    assert s.macro_f_measure() == 1.0


def test_count_vector_merge_equals_whole_set_scoring():
    """Distributed-eval invariant: scoring a file partition per 'host' and
    summing count_vector()s reproduces whole-set metrics exactly (event AND
    segment, macro AND overall/ER) — matching runs per file, so every count
    is additive over files. drop_absent reproduces the direct-scoring class
    list (union of labels present)."""
    from dcase2019_task4_tpu.eval.sed_scores import SedMetrics

    rng = np.random.default_rng(0)
    classes = [f"c{i}" for i in range(6)]
    ref_rows, est_rows = [], []
    for f in range(17):
        fname = f"f{f}.wav"
        for _ in range(rng.integers(1, 5)):
            on = float(rng.uniform(0, 8))
            ref_rows.append([fname, on, on + float(rng.uniform(0.3, 2.0)),
                             classes[rng.integers(0, 5)]])  # c5 absent in ref
        for _ in range(rng.integers(0, 5)):
            on = float(rng.uniform(0, 8))
            est_rows.append([fname, on, on + float(rng.uniform(0.3, 2.0)),
                             classes[rng.integers(0, 6)]])
    ref, est = _df(ref_rows), _df(est_rows)

    whole_ev = event_based_metrics(ref, est)
    whole_seg = segment_based_metrics(ref, est, 1.0)

    P = 3
    ev_vec = np.zeros(3 * len(classes) + 7)
    seg_vec = np.zeros(3 * len(classes) + 7)
    for p in range(P):
        keep = [f"f{f}.wav" for f in range(17) if f % P == p]
        r = ref[ref.filename.isin(keep)].reset_index(drop=True)
        e = est[est.filename.isin(keep)].reset_index(drop=True)
        ev_vec += event_based_metrics(r, e).count_vector(classes)
        seg_vec += segment_based_metrics(r, e, 1.0).count_vector(classes)

    merged_ev = SedMetrics.from_counts(classes, "Event-based", ev_vec)
    merged_seg = SedMetrics.from_counts(classes, "Segment-based", seg_vec,
                                        segment_based=True)
    assert sorted(merged_ev.classes) == sorted(whole_ev.classes)
    assert merged_ev.macro_f_measure() == whole_ev.macro_f_measure()
    assert merged_seg.macro_f_measure() == whole_seg.macro_f_measure()
    for m, w in ((merged_ev, whole_ev), (merged_seg, whole_seg)):
        assert m.results_overall_metrics() == w.results_overall_metrics()
        for c in w.classes:
            assert m.counts[c].tp == w.counts[c].tp
            assert m.counts[c].n_ref == w.counts[c].n_ref
            assert m.counts[c].n_sys == w.counts[c].n_sys


def test_from_counts_drop_absent_semantics():
    """drop_absent (default) removes all-zero classes from the macro — the
    direct-scoring class-list convention; drop_absent=False keeps them
    (zero F1 entries lower the macro)."""
    from dcase2019_task4_tpu.eval.sed_scores import SedMetrics

    classes = ["a", "b"]
    vec = np.zeros(3 * 2 + 7)
    vec[0:3] = (1.0, 1.0, 1.0)  # class a perfect; class b absent
    m = SedMetrics.from_counts(classes, "Event-based", vec)
    assert m.classes == ["a"] and m.macro_f_measure() == 1.0
    m2 = SedMetrics.from_counts(classes, "Event-based", vec, drop_absent=False)
    assert m2.classes == ["a", "b"] and m2.macro_f_measure() == 0.5


def test_all_sum_hosts_single_process_identity():
    from dcase2019_task4_tpu.parallel.multihost import all_sum_hosts

    v = np.array([1.5, 0.0, 3.0])
    out = all_sum_hosts(v)
    np.testing.assert_array_equal(out, v)
    assert out.dtype == np.float64
