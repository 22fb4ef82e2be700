"""Command-line entry points.

Flag surfaces mirror the reference scripts:
  * train-meanteacher ≈ main.py        (-s/--subpart_data, -n/--no_synthetic)
  * train-crnn        ≈ main_simple_CRNN.py (-s, -n/--no_weak)
  * evaluate          ≈ TestModel.py   (-m/--model_path, -s, -p/--save_predictions_fname)
  * download          ≈ download_data.py

Extra flags (new capability): --epochs, --synthetic_audio (fabricated
class-consistent audio when the DESED wavs are absent), --data_parallel
(shard the batch over all visible devices), --multihost (+
--coordinator_address/--num_processes/--process_id: jax.distributed
runtime; every host runs the same command and feeds only its shard of
each global batch — parallel/multihost.py).
"""

from __future__ import annotations

import argparse
import os

from dcase2019_task4_tpu.config import Config
from dcase2019_task4_tpu.utils.logger import get_logger


def _apply_platform_override():
    """DCASE_PLATFORM=cpu routes every CLI onto real XLA:CPU (hermetic runs
    when the axon TPU tunnel is down). The env var JAX_PLATFORMS cannot do
    this here: the host pins it to the axon plugin, which also answers to
    the platform name "cpu" (CLAUDE.md). Must run before jax initializes a
    backend — cli.py imports jax lazily, so calling this at entry is safe."""
    plat = os.environ.get("DCASE_PLATFORM")
    if not plat:
        return
    os.environ.pop("JAX_PLATFORMS", None)
    import jax

    # jax_platforms (not just platform_name) so jax never INITIALIZES the
    # axon plugin: register() pre-set jax_platforms="axon,cpu" at
    # interpreter start, and initializing axon dials the tunnel — a dead
    # tunnel then hangs backend init forever (same trick as tests/conftest).
    jax.config.update("jax_platforms", plat)
    jax.config.update("jax_platform_name", plat)


def _common_train_args(parser):
    parser.add_argument("-s", "--subpart_data", type=int, default=None,
                        help="Number of files per set (smoke-scale runs).")
    parser.add_argument("--epochs", type=int, default=None, help="Override n_epoch.")
    parser.add_argument("--store_dir", type=str, default=None)
    parser.add_argument("--synthetic_audio", action="store_true", default=False,
                        help="Fabricate class-consistent audio instead of reading wavs.")
    parser.add_argument("--synthetic_variability", type=float, default=0.0,
                        help="With --synthetic_audio: nuisance variation "
                        "strength (per-clip noise floor/gain, per-event "
                        "timbre/detune/wobble; labels unchanged). 0 = the "
                        "original deterministic tone-bank source.")
    parser.add_argument("--paired_teacher_view", action="store_true", default=False,
                        help="Mean-Teacher only, with --synthetic_audio: the "
                        "teacher featurizes an INDEPENDENT nuisance render "
                        "of each training clip (second view) instead of the "
                        "student's audio + gaussian noise alone — the "
                        "consistency term then enforces invariance across "
                        "the nuisance distribution (measured to flip the "
                        "consistency gradient positive; RESULTS.md round 5).")
    parser.add_argument("--data_parallel", action="store_true", default=False,
                        help="Shard batches over all visible devices (GSPMD).")
    parser.add_argument("--bf16", action="store_true", default=False,
                        help="bfloat16 conv/frontend compute (throughput mode).")
    parser.add_argument("--scaled", action="store_true", default=False,
                        help="Scaled config: 128 mels, 128-ch convs, 128-cell "
                        "BiGRU, SpecAugment, bf16 (BASELINE.json config 5).")
    parser.add_argument("--resume", type=str, default=None,
                        help="Checkpoint to resume training from (true resume — "
                        "new capability; the reference only re-evaluates).")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--early_stopping", type=int, default=None,
                        help="Stop after N epochs without improvement of the "
                        "SaveBest criterion (the reference defines "
                        "EarlyStopping, utils/utils.py:286-334, but never "
                        "wires it).")
    parser.add_argument("--ramped_adam", action="store_true", default=False,
                        help="Ramped Adam hyperparameter schedule "
                        "(train/schedules.py — the reference's commented-out "
                        "adjust_learning_rate recipe, main.py:32-42,81).")
    parser.add_argument("--device_cache", action="store_true", default=False,
                        help="Pin the whole training set in device memory "
                        "and run each epoch as one scan dispatch (small "
                        "datasets only; ~8 GiB cap). Removes the per-step "
                        "host feed — numerically identical to streaming.")
    parser.add_argument("--eval_every", type=int, default=1,
                        help="Validate/checkpoint/SaveBest every Nth epoch "
                        "(and the last). 1 = reference parity "
                        "(main.py:316-331 validates every epoch).")
    parser.add_argument("--multihost", action="store_true", default=False,
                        help="Bring up the jax multi-host runtime "
                        "(jax.distributed.initialize) before building the "
                        "mesh; implies --data_parallel. Every host runs this "
                        "same command and feeds only its shard of each "
                        "global batch (parallel/multihost.py).")
    parser.add_argument("--coordinator_address", type=str, default=None,
                        help="host:port of process 0 (multi-host).")
    parser.add_argument("--num_processes", type=int, default=None,
                        help="Total host processes (multi-host).")
    parser.add_argument("--process_id", type=int, default=None,
                        help="This host's process index (multi-host).")


def _build_experiment(args, mean_teacher: bool, no_synthetic=False, no_weak=False):
    from dcase2019_task4_tpu.train.experiment import Experiment

    mesh = None
    if getattr(args, "multihost", False):
        from dcase2019_task4_tpu.parallel import multihost

        multihost.initialize(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        args.data_parallel = True
    if args.data_parallel:
        from dcase2019_task4_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    if getattr(args, "scaled", False):
        from dcase2019_task4_tpu.config import scaled_config

        cfg = scaled_config()
    else:
        cfg = Config()
    if getattr(args, "bf16", False):
        import dataclasses

        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, compute_dtype="bfloat16")
        )
    return Experiment(
        cfg,
        mean_teacher=mean_teacher,
        no_synthetic=no_synthetic,
        no_weak=no_weak,
        subpart_data=args.subpart_data,
        synthetic_audio=args.synthetic_audio,
        synthetic_variability=getattr(args, "synthetic_variability", 0.0),
        mesh=mesh,
        seed=args.seed,
        ramped_adam=getattr(args, "ramped_adam", False),
        device_cache=getattr(args, "device_cache", False),
        paired_teacher_view=getattr(args, "paired_teacher_view", False),
    )


def train_meanteacher(argv=None):
    _apply_platform_override()
    parser = argparse.ArgumentParser(description="Mean-Teacher CRNN training (main.py parity)")
    _common_train_args(parser)
    parser.add_argument("-n", "--no_synthetic", action="store_true", default=False,
                        help="Not using synthetic labels during training")
    args = parser.parse_args(argv)
    log = get_logger()
    log.info("MEAN TEACHER")
    log.info(f"subpart_data = {args.subpart_data}")
    log.info(f"Using synthetic data = {not args.no_synthetic}")
    tag = "_no_synthetic" if args.no_synthetic else "_with_synthetic"
    store = args.store_dir or os.path.join(Config().paths.store_dir, "MeanTeacher" + tag)
    exp = _build_experiment(args, mean_teacher=True, no_synthetic=args.no_synthetic)
    exp.build()
    result = exp.run(store_dir=store, n_epoch=args.epochs, resume_from=args.resume,
                     early_stopping=args.early_stopping, eval_every=args.eval_every)
    # final test on validation + public eval (main.py:356-373)
    _final_test(exp, store, args)
    return result


def train_crnn(argv=None):
    _apply_platform_override()
    parser = argparse.ArgumentParser(description="Supervised CRNN training (main_simple_CRNN.py parity)")
    _common_train_args(parser)
    parser.add_argument("-n", "--no_weak", action="store_true", default=False,
                        help="Not using weak labels during training")
    args = parser.parse_args(argv)
    log = get_logger()
    log.info("Simple CRNNs")
    tag = "_synthetic_only" if args.no_weak else "_with_weak"
    store = args.store_dir or os.path.join(Config().paths.store_dir, "simple_CRNN" + tag)
    exp = _build_experiment(args, mean_teacher=False, no_weak=args.no_weak)
    exp.build()
    result = exp.run(store_dir=store, n_epoch=args.epochs, resume_from=args.resume,
                     early_stopping=args.early_stopping, eval_every=args.eval_every)
    _final_test(exp, store, args)
    return result


def _final_test(exp, store, args):
    from dcase2019_task4_tpu.eval.evaluate import CheckpointEvaluator

    best = os.path.join(store, "model", "baseline_best")
    if not os.path.exists(best):
        return
    pred_dir = os.path.join(store, "predictions")
    os.makedirs(pred_dir, exist_ok=True)
    ev = CheckpointEvaluator(best, synthetic_audio=args.synthetic_audio)
    ev.test_model(exp.cfg.paths.validation, args.subpart_data,
                  os.path.join(pred_dir, "baseline_validation.tsv"))
    ev.test_model(exp.cfg.paths.eval_desed, args.subpart_data,
                  os.path.join(pred_dir, "baseline_eval2019.tsv"))


def evaluate(argv=None):
    _apply_platform_override()
    parser = argparse.ArgumentParser(description="Checkpoint evaluation (TestModel.py parity)")
    parser.add_argument("-m", "--model_path", type=str, required=True,
                        help="Checkpoint to evaluate.")
    parser.add_argument("-s", "--subpart_data", type=int, default=None)
    parser.add_argument("-p", "--save_predictions_fname", type=str, default=None)
    parser.add_argument("--synthetic_audio", action="store_true", default=False)
    parser.add_argument("--torch_checkpoint", action="store_true", default=False,
                        help="model_path is a reference torch.save checkpoint "
                        "(imported via train/torch_import.py).")
    parser.add_argument("--sets", type=str, nargs="*", default=None,
                        help="TSV paths; default: eval2018, validation, public eval")
    parser.add_argument("--tune_thresholds", action="store_true", default=False,
                        help="Grid-search per-class weak thresholds on each "
                        "set and report the tuned tagging F1 "
                        "(eval/thresholds.py; the reference accepts "
                        "class_threshold binarization but ships no tuner, "
                        "evaluation_measures.py:60-66).")
    parser.add_argument("--save_thresholds", type=str, default=None,
                        help="With --tune_thresholds: write the tuned "
                        "per-class thresholds of the LAST set as "
                        "{class: threshold} JSON (reusable via "
                        "--thresholds_json).")
    parser.add_argument("--threshold", type=float, default=0.5,
                        help="Strong-decode binarization threshold.")
    parser.add_argument("--thresholds_json", type=str, default=None,
                        help="Per-class decode thresholds JSON ({class: th} "
                        "dict or [C] list) — class_threshold mode, "
                        "evaluation_measures.py:60-66. Overrides --threshold.")
    parser.add_argument("--median_windows_json", type=str, default=None,
                        help="Per-class decode median-window JSON (the "
                        "*.event_windows file --save_thresholds writes, or a "
                        "[C] list of odd ints). Overrides the config's "
                        "scalar median_window.")
    parser.add_argument("--data_parallel", action="store_true", default=False,
                        help="Shard eval batches over all visible devices.")
    parser.add_argument("--export", type=str, default=None,
                        help="Instead of evaluating, export the serving "
                        "function (audio → event probabilities, weights and "
                        "scaler baked in) as a self-contained jax.export/"
                        "StableHLO artifact at this path (eval/export.py; "
                        "load with eval.export.load_serving — only jax "
                        "needed).")
    parser.add_argument("--export_batch", type=int, default=None,
                        help="Batch size the artifact is traced at "
                        "(default: the checkpoint's configured batch size).")
    args = parser.parse_args(argv)
    from dcase2019_task4_tpu.eval.evaluate import CheckpointEvaluator

    mesh = None
    if args.data_parallel:
        from dcase2019_task4_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    if args.torch_checkpoint:
        ev = CheckpointEvaluator.from_torch_checkpoint(
            args.model_path, synthetic_audio=args.synthetic_audio, mesh=mesh
        )
    else:
        ev = CheckpointEvaluator(args.model_path, synthetic_audio=args.synthetic_audio,
                                 mesh=mesh)
    if args.export:
        from dcase2019_task4_tpu.eval.export import export_serving

        header = export_serving(ev, args.export, batch_size=args.export_batch)
        print(f"exported serving artifact → {args.export} "
              f"(batch {header['batch_size']}, platforms {header['platforms']})")
        return header
    paths = ev.cfg.paths
    sets = args.sets or [paths.eval2018, paths.validation, paths.eval_desed]
    threshold = (
        ev.load_thresholds(args.thresholds_json) if args.thresholds_json
        else args.threshold
    )
    median_window = (
        ev.load_windows(args.median_windows_json) if args.median_windows_json
        else None
    )
    results = {}
    for i, tsv in enumerate(sets):
        save = args.save_predictions_fname if i == len(sets) - 1 else None
        res = ev.test_model(
            tsv, args.subpart_data, save,
            tune_thresholds=args.tune_thresholds, threshold=threshold,
            median_window=median_window,
        )
        results[tsv] = {k: v for k, v in res.items() if k != "predictions"}
        if args.save_thresholds and "tuned_thresholds" in res:
            import json

            with open(args.save_thresholds, "w") as f:
                json.dump(dict(zip(ev.codec.labels, res["tuned_thresholds"])), f, indent=1)
            if "tuned_event_thresholds" in res:
                # event-decode thresholds in the same {class: th} format,
                # directly reusable via --thresholds_json; windows ride
                # alongside for operators that also tune the median
                root, ext = os.path.splitext(args.save_thresholds)
                with open(f"{root}.event{ext or '.json'}", "w") as f:
                    json.dump(dict(zip(ev.codec.labels, res["tuned_event_thresholds"])), f, indent=1)
                with open(f"{root}.event_windows{ext or '.json'}", "w") as f:
                    json.dump(dict(zip(ev.codec.labels, res["tuned_event_windows"])), f, indent=1)
    return results


def predict(argv=None):
    """Groundtruth-free batched inference: checkpoint + wav dir (or filename
    TSV) → event predictions TSV (+ optional weak clip-tag TSV). Serving
    surface beyond the reference (TestModel.py always scores vs labels)."""
    _apply_platform_override()
    parser = argparse.ArgumentParser(description="Batched inference to a predictions TSV")
    parser.add_argument("-m", "--model_path", type=str, required=True)
    parser.add_argument("-i", "--input", type=str, required=True,
                        help="Directory of wavs, or a filename TSV.")
    parser.add_argument("-p", "--save_predictions_fname", type=str, required=True)
    parser.add_argument("-s", "--subpart_data", type=int, default=None)
    parser.add_argument("--weak_fname", type=str, default=None,
                        help="Also write clip-level tags (filename⇥event_labels).")
    parser.add_argument("--weak_threshold", type=float, default=0.5)
    parser.add_argument("--weak_thresholds_json", type=str, default=None,
                        help="Per-class clip-tagging thresholds JSON (the "
                        "tuned.json --save_thresholds writes). Overrides "
                        "--weak_threshold.")
    parser.add_argument("--threshold", type=float, default=0.5,
                        help="Strong-decode binarization threshold.")
    parser.add_argument("--thresholds_json", type=str, default=None,
                        help="Per-class decode thresholds JSON (dict or "
                        "[C] list). Overrides --threshold.")
    parser.add_argument("--median_windows_json", type=str, default=None,
                        help="Per-class decode median-window JSON ([C] odd "
                        "ints or {class: w}). Overrides the config default.")
    parser.add_argument("--synthetic_audio", action="store_true", default=False)
    parser.add_argument("--long", action="store_true", default=False,
                        help="Arbitrary-length wavs: window into 10 s chunks "
                        "(static shapes), decode per window, stitch events "
                        "across boundaries. The reference truncates at 10 s.")
    parser.add_argument("--merge_gap", type=float, default=0.2,
                        help="With --long: stitch same-class events whose "
                        "boundary gap is at most this many seconds.")
    parser.add_argument("--overlap", action="store_true", default=False,
                        help="With --long: half-window hop, probabilities "
                        "averaged in overlaps, one decode per file over the "
                        "assembled timeline (median runs across window "
                        "boundaries; no stitching).")
    parser.add_argument("--torch_checkpoint", action="store_true", default=False)
    parser.add_argument("--data_parallel", action="store_true", default=False)
    args = parser.parse_args(argv)
    from dcase2019_task4_tpu.eval.evaluate import CheckpointEvaluator

    mesh = None
    if args.data_parallel:
        from dcase2019_task4_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    if args.torch_checkpoint:
        ev = CheckpointEvaluator.from_torch_checkpoint(
            args.model_path, synthetic_audio=args.synthetic_audio, mesh=mesh
        )
    else:
        ev = CheckpointEvaluator(args.model_path, synthetic_audio=args.synthetic_audio,
                                 mesh=mesh)
    threshold = (
        ev.load_thresholds(args.thresholds_json) if args.thresholds_json
        else args.threshold
    )
    median_window = (
        ev.load_windows(args.median_windows_json) if args.median_windows_json
        else None
    )
    if args.long:
        if args.weak_fname:
            parser.error("--weak_fname is per-clip; not defined under --long")
        res = ev.predict_long(
            args.input, args.save_predictions_fname, subpart=args.subpart_data,
            threshold=threshold, merge_gap=args.merge_gap, overlap=args.overlap,
            median_window=median_window,
        )
    else:
        res = ev.predict_set(
            args.input, args.save_predictions_fname, subpart=args.subpart_data,
            weak_fname=args.weak_fname,
            weak_threshold=(
                ev.load_thresholds(args.weak_thresholds_json)
                if args.weak_thresholds_json else args.weak_threshold
            ),
            threshold=threshold, median_window=median_window,
        )
    return {k: v for k, v in res.items() if k != "predictions"}


def precompute(argv=None):
    """Reference-style feature precompute to .npy (optional — the default
    training path featurizes on device every step)."""
    _apply_platform_override()
    parser = argparse.ArgumentParser(description="Precompute log-mel features to .npy")
    parser.add_argument("--sets", type=str, nargs="*", default=None)
    parser.add_argument("-s", "--subpart_data", type=int, default=None)
    parser.add_argument("--feature_dir", type=str, default=None)
    parser.add_argument("--nolog", action="store_true", default=False,
                        help="store linear mel (reference save_log_feature=False)")
    args = parser.parse_args(argv)
    from dcase2019_task4_tpu.data.audio_io import WavAudioSource
    from dcase2019_task4_tpu.data.features_cache import precompute_features
    from dcase2019_task4_tpu.data.manifests import load_manifest, subpart_manifest

    cfg = Config()
    sets = args.sets or [cfg.paths.weak, cfg.paths.unlabel, cfg.paths.synthetic,
                         cfg.paths.validation]
    log = get_logger()
    for tsv in sets:
        m = subpart_manifest(load_manifest(tsv), args.subpart_data)
        src = WavAudioSource(cfg.paths.audio_dir_for_meta(tsv), cfg.dsp.sample_rate)
        done = precompute_features(m, src, cfg, args.feature_dir,
                                   save_log_feature=not args.nolog)
        log.info(f"{tsv}: cached {len(done)}/{len(m)} files")


def download(argv=None):
    parser = argparse.ArgumentParser(description="DESED audio download (download_data.py parity)")
    parser.add_argument("--sets", type=str, nargs="*", default=None)
    parser.add_argument("--n_jobs", type=int, default=3)
    parser.add_argument("--chunk_size", type=int, default=10)
    args = parser.parse_args(argv)
    from dcase2019_task4_tpu.data.download import download_sets

    cfg = Config()
    sets = args.sets or [cfg.paths.validation, cfg.paths.weak, cfg.paths.unlabel]
    return download_sets(cfg, sets, n_jobs=args.n_jobs, chunk_size=args.chunk_size)
