"""CLI flag-surface tests: the entry points expose the reference's flags
(main.py:170-176, main_simple_CRNN.py:87-92, TestModel.py:66-74) plus the
new capabilities. --help runs in a subprocess (argparse exits)."""

import subprocess
import sys


def _help(script):
    out = subprocess.run(
        [sys.executable, script, "--help"], capture_output=True, text=True, timeout=120
    )
    assert out.returncode == 0, out.stderr
    return out.stdout


def test_train_meanteacher_flags():
    h = _help("train_meanteacher.py")
    for flag in ["--subpart_data", "--no_synthetic", "--epochs", "--synthetic_audio",
                 "--data_parallel", "--bf16", "--scaled", "--resume", "--seed",
                 "--ramped_adam", "--multihost", "--coordinator_address"]:
        assert flag in h, flag


def test_train_crnn_flags():
    h = _help("train_crnn.py")
    for flag in ["--subpart_data", "--no_weak", "--epochs", "--synthetic_audio"]:
        assert flag in h, flag


def test_evaluate_flags():
    h = _help("evaluate.py")
    for flag in ["--model_path", "--subpart_data", "--save_predictions_fname",
                 "--torch_checkpoint", "--sets", "--tune_thresholds"]:
        assert flag in h, flag


def test_download_flags():
    h = _help("download_data.py")
    for flag in ["--sets", "--n_jobs", "--chunk_size"]:
        assert flag in h, flag


def test_extract_features_flags():
    h = _help("extract_features.py")
    for flag in ["--sets", "--subpart_data", "--nolog"]:
        assert flag in h, flag
