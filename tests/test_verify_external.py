"""tools/verify_external.py's OFFLINE refusal path (VERDICT r7 "Next
round" #7): in this sandbox (no pyhdf/rasterio, no network) the script
must report every probe NOT VERIFIED and exit 2 — never green-wash an
unrun check. The probe helpers are also unit-tested directly so the
wiring (module gate, skip-detection, HTTP-response-counts-as-reachable)
is pinned without needing the real environment."""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
SCRIPT = os.path.join(ROOT, "tools", "verify_external.py")

_HAS_LIBS = any(
    importlib.util.find_spec(m) is not None for m in ("pyhdf", "rasterio")
)


def test_offline_refusal_end_to_end():
    proc = subprocess.run(
        [sys.executable, SCRIPT],
        capture_output=True,
        text=True,
        timeout=120,
    )
    if _HAS_LIBS:  # pragma: no cover — not this container
        assert proc.returncode in (0, 1)
        return
    # Without the codec libraries, both parity probes must refuse —
    # regardless of environment. The exit code depends on network: a
    # networked box (the environment README points people at) gets
    # earthdata PASS -> 0 (PARTIAL), the sandbox gets 2 (NOTHING
    # VERIFIED); anything else is a bug.
    assert "pyhdf_parity" in proc.stdout and "rasterio_parity" in proc.stdout
    statuses = {
        line.split()[0]: line.split()[1]
        for line in proc.stdout.strip().splitlines()
        if len(line.split()) > 1
    }
    assert statuses.get("pyhdf_parity") == "NOT"  # "NOT VERIFIED"
    assert statuses.get("rasterio_parity") == "NOT"
    if statuses.get("earthdata_reachability") == "PASS":
        assert proc.returncode == 0, proc.stdout + proc.stderr
        assert "PARTIAL" in proc.stderr
    else:
        assert proc.returncode == 2, proc.stdout + proc.stderr
        assert "NOTHING VERIFIED" in proc.stderr


def test_probe_parity_refuses_missing_module():
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    try:
        import verify_external as ve
    finally:
        sys.path.pop(0)
    status, detail = ve.probe_parity("definitely_not_a_module_xyz", "tests/nope.py")
    assert status == "NOT VERIFIED"
    assert "pip install" in detail


def _ve():
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    try:
        import verify_external as ve
    finally:
        sys.path.pop(0)
    return ve


def test_probe_parity_junit_detects_skip_structurally():
    """ADVICE r8: skip detection must come from junit XML attributes,
    not a ' skipped' substring. A skip-marked parity test with an
    importable stand-in module must come back NOT VERIFIED."""
    if _HAS_LIBS:  # pragma: no cover — not this container
        return
    status, detail = _ve().probe_parity(
        "json", "tests/test_geotiff.py::test_rasterio_swap_parity"
    )
    assert status == "NOT VERIFIED"
    assert "skipped despite" in detail


def test_probe_parity_junit_detects_pass_structurally():
    """A genuinely-running test reports PASS from the junit counts even
    though the pytest summary may mention deselections/warnings (the
    exact false-negative the substring check produced)."""
    status, detail = _ve().probe_parity(
        "json",
        "tests/test_perf_budget.py::test_ratchet_allows_tightening_and_new_queries",
    )
    assert status == "PASS", detail
    assert "1 passed" in detail
