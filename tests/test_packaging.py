"""Packaging metadata stays consistent with the code it points at.

The framework installs via pyproject.toml (setuptools backend) with console
entry points for every CLI surface; this pins that each declared entry point
resolves to a real callable and that the version strings agree, so a wheel
built from this tree cannot ship dangling scripts.
"""

import os
import tomllib

import dcase2019_task4_tpu

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_pyproject():
    with open(os.path.join(ROOT, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_console_scripts_resolve():
    proj = _load_pyproject()["project"]
    assert proj["scripts"], "no console scripts declared"
    for name, target in proj["scripts"].items():
        module, func = target.split(":")
        mod = __import__(module, fromlist=[func])
        assert callable(getattr(mod, func)), f"{name} -> {target} not callable"


def test_version_matches_package():
    proj = _load_pyproject()["project"]
    assert proj["version"] == dcase2019_task4_tpu.__version__


def test_native_source_listed_as_package_data():
    data = _load_pyproject()["tool"]["setuptools"]["package-data"]
    assert "wavpack.cpp" in data["dcase2019_task4_tpu.native"]
    assert os.path.exists(
        os.path.join(ROOT, "dcase2019_task4_tpu", "native", "wavpack.cpp")
    )


def test_dependencies_cover_top_level_imports():
    """Every third-party import in the package is declared (or stdlib)."""
    proj = _load_pyproject()["project"]
    declared = {d.split(">=")[0].split("==")[0].strip() for d in proj["dependencies"]}
    # torch is an optional extra (reference-checkpoint import path only).
    extras = {
        d.split(">=")[0].strip()
        for group in proj.get("optional-dependencies", {}).values()
        for d in group
    }
    for pkg in ("jax", "numpy", "optax", "pandas", "scipy"):
        assert pkg in declared, pkg
    assert "torch" in extras
