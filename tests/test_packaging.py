"""Packaging metadata (round-9 verdict item 8): the library story must
not end at `sys.path.insert` — `pyproject.toml` declares the package and
its requirements, and a gated smoke proves `pip install -e .` actually
resolves + imports.

The pip smoke is env-gated (SPARK_GRAFT_PIP_SMOKE=1): it shells out to
pip with --no-deps (the container forbids network installs; deps are
baked in) and imports the package from a clean interpreter, which takes
seconds and mutates site-packages — not something every `pytest -x -q`
run should do. The metadata assertions below always run.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pyproject_declares_package_and_deps():
    try:
        import tomllib
    except ImportError:  # pragma: no cover - py<3.11
        pytest.skip("tomllib unavailable")
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        meta = tomllib.load(f)
    proj = meta["project"]
    assert proj["name"] == "duckdb-ann-spark"
    deps = " ".join(proj["dependencies"])
    for req in ("pyspark", "numpy", "pandas", "pyarrow"):
        assert req in deps, f"missing dependency declaration: {req}"
    assert meta["tool"]["setuptools"]["packages"]["find"]["include"] == [
        "duckdb_ann_spark*"
    ]


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_PIP_SMOKE", "0") != "1",
    reason="pip-install smoke gated behind SPARK_GRAFT_PIP_SMOKE=1",
)
def test_pip_install_editable_smoke(tmp_path):
    import importlib.util

    if importlib.util.find_spec("wheel") is not None:
        cmd = [sys.executable, "-m", "pip", "install", "--no-deps",
               "--no-build-isolation", "-e", REPO]
    else:
        # this container: setuptools 65.5 without `wheel`, where pip's
        # PEP 660 editable path dies on `invalid command 'bdist_wheel'`
        # and --no-use-pep517 refuses outright — the setup.py shim's
        # legacy develop install is the editable path that works
        cmd = [sys.executable, "setup.py", "develop", "--no-deps"]
    r = subprocess.run(
        cmd, capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    # import from a clean interpreter cwd (NOT the repo root, so the
    # import resolves through site-packages' editable hook, not the cwd)
    r = subprocess.run(
        [sys.executable, "-c",
         "import duckdb_ann_spark as m; print(m.__name__)"],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=120,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "duckdb_ann_spark" in r.stdout
