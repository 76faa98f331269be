"""Every icegopher_spark module must import cleanly in isolation.

Regression for the r9 import-order bug: streaming_queries resolved
iceberg_queries.cdc_scd2_oracle with a module-scope __import__, so any
process importing icegopher_spark.iceberg_queries *first* died on a
partially-initialized module (the driver imported queries first and
never saw it). Importing each module as the FIRST package import in a
fresh interpreter catches that whole class of cycle.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
PKG = REPO / "icegopher_spark"


def _module_names() -> list[str]:
    names = []
    for py in sorted(PKG.rglob("*.py")):
        rel = py.relative_to(REPO)
        parts = list(rel.with_suffix("").parts)
        if parts[-1] == "__init__":
            parts = parts[:-1]
        names.append(".".join(parts))
    return names


@pytest.mark.parametrize("module", _module_names())
def test_module_imports_first(module: str) -> None:
    proc = subprocess.run(
        [sys.executable, "-c", f"import {module}"],
        cwd=str(REPO),
        capture_output=True,
        text=True,
        # generous: under a full-suite run the 32-thread Spark JVM can
        # starve this subprocess; the test is about import ERRORS, not
        # import latency
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"import {module} failed as first package import:\n"
        f"stdout: {proc.stdout[-500:]}\nstderr: {proc.stderr[-2000:]}"
    )
