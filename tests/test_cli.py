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
                 "--torch_checkpoint", "--sets", "--tune_thresholds",
                 "--thresholds_json", "--median_windows_json"]:
        assert flag in h, flag


def test_predict_flags():
    h = _help("predict.py")
    for flag in ["--thresholds_json", "--median_windows_json",
                 "--weak_thresholds_json", "--long", "--overlap"]:
        assert flag in h, flag


def test_download_flags():
    h = _help("download_data.py")
    for flag in ["--sets", "--n_jobs", "--chunk_size"]:
        assert flag in h, flag


def test_extract_features_flags():
    h = _help("extract_features.py")
    for flag in ["--sets", "--subpart_data", "--nolog"]:
        assert flag in h, flag


def test_platform_override_routes_to_real_cpu():
    """DCASE_PLATFORM=cpu must land on real XLA:CPU WITHOUT initializing the
    axon plugin (whose backend init dials the TPU tunnel and hangs forever
    when the tunnel is down). Subprocess: the override mutates global jax
    config before backend init."""
    import os

    env = dict(os.environ)
    env["DCASE_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "axon"  # simulate the host pin
    out = subprocess.run(
        [sys.executable, "-c",
         "from dcase2019_task4_tpu.cli import _apply_platform_override\n"
         "_apply_platform_override()\n"
         "import jax\n"
         "assert jax.default_backend() == 'cpu', jax.default_backend()\n"
         "assert 'JAX_PLATFORMS' not in __import__('os').environ\n"
         "print('cpu-ok')\n"],
        capture_output=True, text=True, timeout=120, env=env,
    )
    assert out.returncode == 0, out.stderr
    assert "cpu-ok" in out.stdout
