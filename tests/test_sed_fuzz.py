"""Differential fuzzing of the native SED scorer (eval/sed_scores.py).

The reference delegates all headline scoring to the external `sed_eval`
package (evaluation_measures.py:124-182), which cannot be installed here
(zero egress). The 14 hand-traced fixtures in test_sed_eval_derived.py pin
specific cases; this file adds the strongest parity evidence obtainable
without the package: a few hundred seeded random event-list cases checked
against INDEPENDENT re-implementations and metamorphic invariants.

What is asserted, per VERDICT r4 item 5:

  (i)   greedy F1 <= bipartite F1 on every case (per class and macro; with
        equal n_ref/n_sys, F = 2tp/(n_ref+n_sys) is monotone in tp), with
        EQUALITY whenever the per-(file,class) hit matrix is collision-free
        (<=1 candidate per row and column, where greedy is provably optimal);
  (ii)  event-based counts (tp/n_ref/n_sys per class, substitutions, ER
        decomposition) equal a from-scratch re-implementation of sed_eval's
        documented algorithm written in this file with different data
        structures; segment-based counts equal a brute-force interval-
        overlap roll (no floor/ceil of event times — a genuinely different
        derivation of segment activity);
  (iii) metamorphic invariants: filename bijection, class-label bijection,
        global time shift (any shift for event-based; whole-segment shifts
        for segment-based), time dilation with collar/resolution co-scaling
        (powers of two, so float math is exact), file-order permutation,
        and est-row-order invariance of the bipartite matcher;
  (iv)  the distributed count-vector contract: scoring file shards
        separately and merging count vectors equals direct scoring for any
        partition of the files (the multi-host eval path's correctness).

Generator coverage: variable file counts, overlapping events, duplicated
(identical) events, label collisions, zero-length and touching events,
sub-collar perturbed copies, label-swapped copies (substitution drivers),
far-off insertions, NaN-label rows in both reference and estimate, and
files present in the reference with no (non-NaN) events.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dcase2019_task4_tpu.eval.sed_scores import (
    SedMetrics,
    event_based_metrics,
    segment_based_metrics,
)

CLASS_POOL = ["Alarm", "Blender", "Cat", "Dishes", "Dog"]
T_COLLAR = 0.200
PCT = 0.2


# ------------------------------------------------------------- generator


def make_case(seed: int):
    """Seeded random (reference, estimated) dataframe pair."""
    rng = np.random.default_rng(seed)
    n_files = int(rng.integers(1, 7))
    classes = list(rng.choice(CLASS_POOL, size=int(rng.integers(1, 6)), replace=False))
    ref_rows, est_rows = [], []
    for fi in range(n_files):
        fname = f"f{fi}.wav"
        n_ref = int(rng.integers(0, 9))
        file_ref = []
        for _ in range(n_ref):
            on = float(np.round(rng.uniform(0, 9.5), 3))
            kind = rng.integers(0, 5)
            if kind == 0:
                dur = 0.0  # zero-length event
            elif kind == 1:
                dur = 0.01
            else:
                dur = float(np.round(rng.uniform(0.05, 3.0), 3))
            lab = str(rng.choice(classes))
            file_ref.append((fname, on, on + dur, lab))
            if rng.random() < 0.15:  # exact duplicate (label collision)
                file_ref.append((fname, on, on + dur, lab))
            if rng.random() < 0.15:  # touching event sharing a boundary
                d2 = float(np.round(rng.uniform(0.0, 1.0), 3))
                file_ref.append((fname, on + dur, on + dur + d2, lab))
        ref_rows.extend(file_ref)
        if not file_ref or rng.random() < 0.2:
            # file known to the reference with no (non-NaN) strong events —
            # every evaluated file appears in the reference TSV (the scorer
            # iterates reference["filename"].unique()), like validation.tsv
            ref_rows.append((fname, np.nan, np.nan, np.nan))
        # estimates: perturbed copies (in/out of collar), label swaps,
        # random insertions, occasional NaN rows
        for fname2, on, off, lab in file_ref:
            r = rng.random()
            if r < 0.35:  # within-collar copy (clamped at t=0 — decoders
                # never emit negative times, and the t>=0 segment grid
                # clips them, breaking shift metamorphy)
                d_on = float(rng.uniform(-0.9, 0.9)) * T_COLLAR
                d_off = float(rng.uniform(-0.9, 0.9)) * max(T_COLLAR, PCT * (off - on))
                e_on = max(0.0, on + d_on)
                est_rows.append((fname2, e_on, max(e_on, off + d_off), lab))
            elif r < 0.5:  # out-of-collar copy
                est_rows.append((fname2, on + 3 * T_COLLAR + 0.05, off + 3 * T_COLLAR + 0.05, lab))
            elif r < 0.65:  # label-swapped within-collar copy (substitution)
                other = str(rng.choice(classes))
                est_rows.append((fname2, on, off, other))
        for _ in range(int(rng.integers(0, 4))):  # random insertions
            on = float(np.round(rng.uniform(0, 9.5), 3))
            dur = float(np.round(rng.uniform(0.0, 2.0), 3))
            est_rows.append((fname, on, on + dur, str(rng.choice(classes))))
        if rng.random() < 0.1:
            est_rows.append((fname, np.nan, np.nan, np.nan))
    cols = ["filename", "onset", "offset", "event_label"]
    ref = pd.DataFrame(ref_rows, columns=cols)
    est = pd.DataFrame(est_rows, columns=cols)
    # shuffle estimate row order (greedy is defined on row order — the
    # independent twin must see the identical order)
    if len(est):
        est = est.sample(frac=1.0, random_state=int(rng.integers(0, 2**31))).reset_index(drop=True)
    return ref, est


# --------------------------------------- independent event-based scorer


def _rows(df):
    out = []
    for _, r in df.iterrows():
        lab = r["event_label"]
        if isinstance(lab, float) and np.isnan(lab):
            continue
        out.append((r["filename"], float(r["onset"]), float(r["offset"]), lab))
    return out


def _hit(r, e):
    off_collar = max(T_COLLAR, PCT * (r[2] - r[1]))
    return abs(r[1] - e[1]) <= T_COLLAR and abs(r[2] - e[2]) <= off_collar


def brute_event_based(ref_df, est_df):
    """From-scratch sed_eval event-based algorithm: flat row lists, explicit
    matched-id sets, no hit matrices. Returns (per-class counts, n_subs,
    overall tp) keyed independently of the production code paths."""
    ref = _rows(ref_df)
    est = _rows(est_df)
    files = list(dict.fromkeys(ref_df["filename"]))  # unique, first-seen order
    counts = {}  # class -> [tp, n_ref, n_sys]
    classes = sorted({r[3] for r in ref} | {e[3] for e in est})
    for c in classes:
        counts[c] = [0.0, 0.0, 0.0]
    n_subs = 0
    overall_tp = 0
    n_ref_tot = n_sys_tot = 0
    for f in files:
        fr = [(i, r) for i, r in enumerate(ref) if r[0] == f]
        fe = [(j, e) for j, e in enumerate(est) if e[0] == f]
        n_ref_tot += len(fr)
        n_sys_tot += len(fe)
        matched_ref, matched_est = set(), set()
        for c in classes:
            cr = [(i, r) for i, r in fr if r[3] == c]
            ce = [(j, e) for j, e in fe if e[3] == c]
            counts[c][1] += len(cr)
            counts[c][2] += len(ce)
            for i, r in cr:
                for j, e in ce:
                    if j in matched_est:
                        continue
                    if _hit(r, e):
                        matched_ref.add(i)
                        matched_est.add(j)
                        counts[c][0] += 1
                        overall_tp += 1
                        break
        for i, r in fr:
            if i in matched_ref:
                continue
            for j, e in fe:
                if j in matched_est or e[3] == r[3]:
                    continue
                if _hit(r, e):
                    matched_est.add(j)
                    n_subs += 1
                    break
    return counts, n_subs, overall_tp, n_ref_tot, n_sys_tot


# ------------------------------------- independent segment-based scorer


def brute_segment_based(ref_df, est_df, res=1.0):
    """Segment activity via interval overlap — a segment [k*res,(k+1)*res)
    is active for a class iff some event intersects its interior (onset <
    segment end AND offset > segment start). No floor/ceil of event times.
    Returns (per-class counts, (S, D, I))."""
    ref = _rows(ref_df)
    est = _rows(est_df)
    files = list(dict.fromkeys(ref_df["filename"]))
    classes = sorted({r[3] for r in ref} | {e[3] for e in est})
    counts = {c: [0.0, 0.0, 0.0] for c in classes}
    S = D = I = 0.0
    for f in files:
        fr = [r for r in ref if r[0] == f]
        fe = [e for e in est if e[0] == f]
        max_off = max([r[2] for r in fr] + [e[2] for e in fe] + [0.0])
        n_seg = int(np.ceil(max_off / res))
        for k in range(n_seg):
            s0, s1 = k * res, (k + 1) * res
            ra = {c for c in classes
                  if any(r[3] == c and r[1] < s1 and r[2] > s0 for r in fr)}
            ea = {c for c in classes
                  if any(e[3] == c and e[1] < s1 and e[2] > s0 for e in fe)}
            for c in ra & ea:
                counts[c][0] += 1
            for c in ra:
                counts[c][1] += 1
            for c in ea:
                counts[c][2] += 1
            fn_t = len(ra - ea)
            fp_t = len(ea - ra)
            s_t = min(fn_t, fp_t)
            S += s_t
            D += fn_t - s_t
            I += fp_t - s_t
    return counts, (S, D, I)


def _boundary_safe(df, res=1.0, eps=1e-9):
    """The two segment formulations agree except exactly ON a segment
    boundary, where float(0.3*res etc.) grid effects would make the test
    flaky; generated times use 3 decimals so exact-boundary collisions are
    real and must be excluded, not fudged."""
    for col in ("onset", "offset"):
        v = df[col].dropna().to_numpy(float)
        frac = np.abs(v / res - np.round(v / res))
        if np.any(frac < eps):
            return False
    return True


# ------------------------------------------------------------------ tests


FUZZ_SEEDS = range(300)


@pytest.mark.parametrize("seed", FUZZ_SEEDS)
def test_event_based_vs_independent_reimplementation(seed):
    ref, est = make_case(seed)
    m = event_based_metrics(ref, est, T_COLLAR, PCT)
    counts, n_subs, overall_tp, n_ref_tot, n_sys_tot = brute_event_based(ref, est)
    assert set(m.classes) == set(counts)
    for c in m.classes:
        cc = m.counts[c]
        assert (cc.tp, cc.n_ref, cc.n_sys) == tuple(counts[c]), (seed, c)
    assert m.n_subs == n_subs, seed
    assert m.overall.tp == overall_tp
    assert m.overall.n_ref == n_ref_tot
    assert m.overall.n_sys == n_sys_tot
    # ER decomposition internal consistency: S <= min(fn, fp), D/I >= 0
    o = m.results_overall_metrics()["error_rate"]
    assert o["deletion_rate"] >= 0 and o["insertion_rate"] >= 0
    if m.overall.n_ref:
        er = (o["substitution_rate"] + o["deletion_rate"] + o["insertion_rate"])
        assert er == pytest.approx(o["error_rate"])


@pytest.mark.parametrize("seed", FUZZ_SEEDS)
def test_greedy_leq_bipartite_and_collision_free_equality(seed):
    ref, est = make_case(seed)
    g = event_based_metrics(ref, est, T_COLLAR, PCT, matching="greedy")
    b = event_based_metrics(ref, est, T_COLLAR, PCT, matching="bipartite")
    for c in g.classes:
        assert g.counts[c].tp <= b.counts[c].tp, (seed, c)
        assert g.counts[c].f_measure <= b.counts[c].f_measure + 1e-12
        assert (g.counts[c].n_ref, g.counts[c].n_sys) == (
            b.counts[c].n_ref, b.counts[c].n_sys)
    assert g.macro_f_measure() <= b.macro_f_measure() + 1e-12
    # collision-free (<=1 candidate per row and per column in every
    # (file,class) hit matrix) => greedy is optimal => equality
    ref_rows, est_rows = _rows(ref), _rows(est)
    collision_free = True
    for f in {r[0] for r in ref_rows}:
        for c in {r[3] for r in ref_rows if r[0] == f}:
            cr = [r for r in ref_rows if r[0] == f and r[3] == c]
            ce = [e for e in est_rows if e[0] == f and e[3] == c]
            hits = np.array([[_hit(r, e) for e in ce] for r in cr], bool)
            if hits.size and (hits.sum(0).max(initial=0) > 1 or hits.sum(1).max(initial=0) > 1):
                collision_free = False
    if collision_free:
        for c in g.classes:
            assert g.counts[c].tp == b.counts[c].tp, (seed, c)


@pytest.mark.parametrize("seed", FUZZ_SEEDS)
def test_segment_based_vs_interval_overlap_roll(seed):
    ref, est = make_case(seed)
    if not (_boundary_safe(ref) and _boundary_safe(est)):
        # exact on-boundary times: floor/ceil vs strict-overlap genuinely
        # tie-break differently at zero measure; sed_eval uses the
        # floor/ceil convention, which the production code implements
        pytest.skip("event boundary exactly on a segment edge")
    m = segment_based_metrics(ref, est, 1.0)
    counts, (S, D, I) = brute_segment_based(ref, est, 1.0)
    for c in m.classes:
        cc = m.counts[c]
        assert (cc.tp, cc.n_ref, cc.n_sys) == tuple(counts[c]), (seed, c)
    assert (m.seg_S, m.seg_D, m.seg_I) == (S, D, I), seed


@pytest.mark.parametrize("seed", range(60))
def test_metamorphic_filename_and_class_bijection(seed):
    ref, est = make_case(seed)
    base_e = event_based_metrics(ref, est, T_COLLAR, PCT)
    base_s = segment_based_metrics(ref, est, 1.0)
    rng = np.random.default_rng(seed + 10_000)
    fmap = {f: f"renamed_{i}_{f}" for i, f in enumerate(ref["filename"].unique())}
    cmap = dict(zip(CLASS_POOL, rng.permutation(CLASS_POOL)))

    def remap(df):
        df = df.copy()
        df["filename"] = df["filename"].map(lambda f: fmap.get(f, f))
        df["event_label"] = df["event_label"].map(
            lambda c: cmap[c] if isinstance(c, str) else c)
        return df

    e2 = event_based_metrics(remap(ref), remap(est), T_COLLAR, PCT)
    s2 = segment_based_metrics(remap(ref), remap(est), 1.0)
    assert e2.macro_f_measure() == pytest.approx(base_e.macro_f_measure(), abs=1e-12)
    assert s2.macro_f_measure() == pytest.approx(base_s.macro_f_measure(), abs=1e-12)
    for c in base_e.classes:
        assert e2.counts[cmap[c]].tp == base_e.counts[c].tp
        assert s2.counts[cmap[c]].tp == base_s.counts[c].tp
    assert e2.results_overall_metrics() == base_e.results_overall_metrics()
    assert s2.results_overall_metrics() == base_s.results_overall_metrics()


@pytest.mark.parametrize("seed", range(60))
def test_metamorphic_time_shift_and_dilation(seed):
    ref, est = make_case(seed)
    base_e = event_based_metrics(ref, est, T_COLLAR, PCT)

    def shift(df, dt):
        df = df.copy()
        df["onset"] += dt
        df["offset"] += dt
        return df

    # event-based: invariant under ANY common shift (collars compare deltas)
    e2 = event_based_metrics(shift(ref, 5.25), shift(est, 5.25), T_COLLAR, PCT)
    for c in base_e.classes:
        assert e2.counts[c].tp == base_e.counts[c].tp, (seed, c)
    assert e2.n_subs == base_e.n_subs

    # segment-based: invariant under whole-segment shifts (leading empty
    # segments carry zero counts). `x + 3.0` can round a time across a
    # segment edge (float), flipping a floor/ceil — a float-grid property
    # shared with sed_eval, not a scorer defect — so only assert when no
    # time sits on an edge before or after the shift.
    base_s = segment_based_metrics(ref, est, 1.0)
    if all(_boundary_safe(d, eps=1e-12) for d in
           (ref, est, shift(ref, 3.0), shift(est, 3.0))):
        s2 = segment_based_metrics(shift(ref, 3.0), shift(est, 3.0), 1.0)
        for c in base_s.classes:
            assert s2.counts[c].tp == base_s.counts[c].tp, (seed, c)
            assert s2.counts[c].n_ref == base_s.counts[c].n_ref
            assert s2.counts[c].n_sys == base_s.counts[c].n_sys
        assert (s2.seg_S, s2.seg_D, s2.seg_I) == (base_s.seg_S, base_s.seg_D, base_s.seg_I)

    # dilation by powers of two with collar/resolution co-scaling is exact
    for s in (2.0, 0.5):
        def dil(df):
            df = df.copy()
            df["onset"] *= s
            df["offset"] *= s
            return df

        e3 = event_based_metrics(dil(ref), dil(est), T_COLLAR * s, PCT)
        for c in base_e.classes:
            assert e3.counts[c].tp == base_e.counts[c].tp, (seed, c, s)
        assert e3.n_subs == base_e.n_subs
        s3 = segment_based_metrics(dil(ref), dil(est), 1.0 * s)
        for c in base_s.classes:
            assert s3.counts[c].tp == base_s.counts[c].tp, (seed, c, s)
        assert (s3.seg_S, s3.seg_D, s3.seg_I) == (base_s.seg_S, base_s.seg_D, base_s.seg_I)


@pytest.mark.parametrize("seed", range(60))
def test_metamorphic_order_sensitivity_contracts(seed):
    ref, est = make_case(seed)
    rng = np.random.default_rng(seed + 77)
    # file-block permutation, preserving within-file row order: greedy
    # matching runs per file, so ALL results are invariant
    files = list(ref["filename"].unique())
    perm = list(rng.permutation(files))
    order = {f: i for i, f in enumerate(perm)}

    def file_permute(df):
        df = df.copy()
        df["_k"] = df["filename"].map(order)
        df = df.sort_values("_k", kind="stable").drop(columns="_k").reset_index(drop=True)
        return df

    base = event_based_metrics(ref, est, T_COLLAR, PCT)
    p = event_based_metrics(file_permute(ref), file_permute(est), T_COLLAR, PCT)
    for c in base.classes:
        assert p.counts[c].tp == base.counts[c].tp
    assert p.n_subs == base.n_subs
    # bipartite tp is invariant under WITHIN-file est-row shuffles
    # (greedy's row-order sensitivity is sed_eval-documented, not asserted)
    if len(est):
        est_shuf = est.sample(frac=1.0, random_state=seed).reset_index(drop=True)
        b1 = event_based_metrics(ref, est, T_COLLAR, PCT, matching="bipartite")
        b2 = event_based_metrics(ref, est_shuf, T_COLLAR, PCT, matching="bipartite")
        for c in b1.classes:
            assert b1.counts[c].tp == b2.counts[c].tp, (seed, c)


@pytest.mark.parametrize("seed", range(60))
@pytest.mark.parametrize("segment", [False, True])
def test_count_vector_shard_merge_equals_direct(seed, segment):
    """Distributed contract: score any partition of the files shard-by-shard,
    sum the count vectors, rebuild — equals direct scoring (the multi-host
    eval path, parallel/multihost.py all_sum_hosts)."""
    ref, est = make_case(seed)
    score = (lambda r, e: segment_based_metrics(r, e, 1.0)) if segment else (
        lambda r, e: event_based_metrics(r, e, T_COLLAR, PCT))
    direct = score(ref, est)
    files = list(ref["filename"].unique())
    rng = np.random.default_rng(seed + 5)
    n_shards = int(rng.integers(1, 5))
    assign = rng.integers(0, n_shards, len(files))
    all_classes = sorted(CLASS_POOL)
    vec = np.zeros(3 * len(all_classes) + 7)
    for s in range(n_shards):
        keep = {f for f, a in zip(files, assign) if a == s}
        r = ref[ref["filename"].isin(keep)].reset_index(drop=True)
        e = est[est["filename"].isin(keep)].reset_index(drop=True)
        if r.empty:
            continue
        vec += score(r, e).count_vector(all_classes)
    merged = SedMetrics.from_counts(
        all_classes, "merged", vec, segment_based=segment)
    assert set(merged.classes) == set(direct.classes), seed
    for c in direct.classes:
        assert merged.counts[c].tp == direct.counts[c].tp, (seed, c)
        assert merged.counts[c].n_ref == direct.counts[c].n_ref
        assert merged.counts[c].n_sys == direct.counts[c].n_sys
    assert merged.macro_f_measure() == pytest.approx(direct.macro_f_measure(), abs=1e-12)
    assert merged.results_overall_metrics() == direct.results_overall_metrics()
