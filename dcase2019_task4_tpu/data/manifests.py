"""TSV manifests for the three DESED label schemas.

Replaces the reference's pandas-dataframe-threading
(DatasetDcase2019Task4.get_df_from_meta, DataLoadDf) with an explicit
`Manifest` that packs labels into dense numpy arrays once, so the training
hot path never touches pandas.

Schemas (reference README.md:106-133):
  * unlabeled: `filename`
  * weak:      `filename ⇥ event_labels` (comma-joined)
  * strong:    `filename ⇥ onset ⇥ offset ⇥ event_label` (one row per event)
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np
import pandas as pd

from dcase2019_task4_tpu.data.encoder import LabelCodec, events_to_frames


@dataclasses.dataclass
class Manifest:
    """One dataset split: unique filenames + per-file labels.

    kind is one of "unlabeled" | "weak" | "strong".
    For "strong", events hold (class_id, onset_sec, offset_sec) per file.
    """

    kind: str
    filenames: List[str]
    df: pd.DataFrame  # original rows (for scoring / TSV round-trips)
    # weak: list (per file) of class-name lists
    weak_labels: Optional[List[List[str]]] = None
    # strong: list (per file) of (label, onset_sec, offset_sec) tuples
    events: Optional[List[List[tuple]]] = None

    def __len__(self) -> int:
        return len(self.filenames)

    # ------------------------------------------------------------ packing

    def encode_targets(
        self,
        codec: LabelCodec,
        sample_rate: int,
        hop_length: int,
        pooling_time_ratio: int,
    ) -> np.ndarray:
        """Pack this split's labels into one [N, n_frames, C] float array.

        * unlabeled → all −1 (the concat-and-mask trick of DataLoad.py:104)
        * weak      → each present class active on every frame
        * strong    → event spans converted sec→pooled frames with the
          reference's floor-div arithmetic (main.py:227-228)
        """
        N, T, C = len(self), codec.n_frames, len(codec.labels)
        y = np.zeros((N, T, C), dtype=np.float32)
        if self.kind == "unlabeled":
            y.fill(-1.0)
            return y
        if self.kind == "weak":
            for i, labels in enumerate(self.weak_labels):
                for l in labels:
                    y[i, :, codec._index[l]] = 1.0
            return y
        for i, evs in enumerate(self.events):
            if not evs:
                continue
            labels = [e[0] for e in evs]
            on, off = events_to_frames(
                np.array([e[1] for e in evs]),
                np.array([e[2] for e in evs]),
                sample_rate,
                hop_length,
                pooling_time_ratio,
            )
            for l, o, f in zip(labels, on, off):
                y[i, max(0, o) : min(T, f), codec._index[l]] = 1.0
        return y


def load_manifest(tsv_path: str) -> Manifest:
    """Parse a TSV into a Manifest, auto-detecting the schema."""
    df = pd.read_csv(tsv_path, header=0, sep="\t")
    cols = set(df.columns)
    if {"onset", "offset", "event_label"}.issubset(cols):
        return _strong_manifest(df)
    if "event_labels" in cols:
        return _weak_manifest(df)
    if "filename" in cols:
        filenames = list(df["filename"].drop_duplicates())
        return Manifest(kind="unlabeled", filenames=filenames, df=df)
    raise ValueError(f"Unrecognized manifest schema: {sorted(cols)}")


def _weak_manifest(df: pd.DataFrame) -> Manifest:
    filenames = list(df["filename"].drop_duplicates())
    labels: List[List[str]] = []
    by_file = df.drop_duplicates("filename").set_index("filename")
    for f in filenames:
        raw = by_file.loc[f, "event_labels"]
        if pd.isna(raw) or raw == "":
            labels.append([])
        else:
            labels.append(str(raw).split(","))
    return Manifest(kind="weak", filenames=filenames, df=df, weak_labels=labels)


def _strong_manifest(df: pd.DataFrame) -> Manifest:
    filenames = list(df["filename"].drop_duplicates())
    events: List[List[tuple]] = []
    grouped = dict(list(df.groupby("filename", sort=False)))
    for f in filenames:
        g = grouped[f]
        evs = []
        for _, row in g.iterrows():
            if pd.isna(row["event_label"]):
                continue
            evs.append((row["event_label"], float(row["onset"]), float(row["offset"])))
        events.append(evs)
    return Manifest(kind="strong", filenames=filenames, df=df, events=events)


def manifest_from_df(df: pd.DataFrame) -> Manifest:
    cols = set(df.columns)
    if {"onset", "offset", "event_label"}.issubset(cols):
        return _strong_manifest(df)
    if "event_labels" in cols:
        return _weak_manifest(df)
    return Manifest(kind="unlabeled", filenames=list(df["filename"].drop_duplicates()), df=df)


def subpart_manifest(m: Manifest, subpart_data: Optional[int], seed: int = 10) -> Manifest:
    """Subsample to `subpart_data` files (reference get_subpart_data,
    DatasetDcase2019Task4.py:122-129: sample unique filenames, seed 10)."""
    if subpart_data is None or subpart_data > len(m.filenames):
        return m
    keep = (
        m.df["filename"].drop_duplicates().sample(subpart_data, random_state=seed)
    )
    df = m.df[m.df["filename"].isin(keep)].reset_index(drop=True)
    return manifest_from_df(df)


def shard_manifest(m: Manifest, process_index: int, process_count: int) -> Manifest:
    """Every process_count-th unique filename (round-robin) — the multi-host
    evaluation partition. Event/segment/tagging metric COUNTS are additive
    over any file partition (eval/sed_scores.py count_vector), so each host
    scores only its shard and the merged numbers are exact."""
    if process_count <= 1:
        return m
    files = m.df["filename"].drop_duplicates().reset_index(drop=True)
    keep = files[process_index::process_count]
    df = m.df[m.df["filename"].isin(keep)].reset_index(drop=True)
    return manifest_from_df(df)


def split_weak(m: Manifest, frac: float = 0.8, seed: int = 26):
    """80/20 split of a weak manifest by row (reference main.py:215-218)."""
    train_df = m.df.sample(frac=frac, random_state=seed)
    valid_df = m.df.drop(train_df.index).reset_index(drop=True)
    train_df = train_df.reset_index(drop=True)
    return manifest_from_df(train_df), manifest_from_df(valid_df)


def split_synthetic(m: Manifest, frac: float = 0.8, seed: int = 26):
    """80/20 split of a strong manifest by unique filename
    (reference main.py:221-223)."""
    keep = m.df["filename"].drop_duplicates().sample(frac=frac, random_state=seed)
    train_df = m.df[m.df["filename"].isin(keep)]
    valid_df = m.df.drop(train_df.index).reset_index(drop=True)
    return manifest_from_df(train_df.reset_index(drop=True)), manifest_from_df(valid_df)


def random_split(m: Manifest, lengths: Sequence[int], seed: int = 0):
    """Split by unique file into non-overlapping manifests of the given
    sizes (reference random_split, DataLoad.py:461-477)."""
    if sum(lengths) != len(m.filenames):
        raise ValueError("Sum of input lengths does not equal the manifest length")
    perm = np.random.default_rng(seed).permutation(len(m.filenames))
    out, start = [], 0
    for n in lengths:
        keep = {m.filenames[i] for i in perm[start : start + n]}
        out.append(manifest_from_df(m.df[m.df["filename"].isin(keep)].reset_index(drop=True)))
        start += n
    return out


def train_valid_split(m: Manifest, validation_amount: float, seed: int = 0):
    """(train, valid) split (reference train_valid_split,
    DataLoad.py:480-485)."""
    n_valid = int(validation_amount * len(m.filenames))
    train, valid = random_split(m, [len(m.filenames) - n_valid, n_valid], seed)
    return train, valid


def classes_from_manifests(manifests: Sequence[Manifest]) -> List[str]:
    """Union of classes across manifests (reference get_classes,
    DatasetDcase2019Task4.py:108-120). Sorted for determinism."""
    classes = set()
    for m in manifests:
        if m.kind == "strong":
            for evs in m.events:
                classes.update(e[0] for e in evs)
        elif m.kind == "weak":
            for ls in m.weak_labels:
                classes.update(ls)
    return sorted(classes)
