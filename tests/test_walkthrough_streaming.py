"""Executes every python block of docs/STREAMING.md in order (the
streaming counterpart of test_walkthrough_datapipe.py). The namespace
additionally provides ``work_dir`` — replay staging needs a scratch
directory."""

from __future__ import annotations

import re
from pathlib import Path

DOC = Path(__file__).resolve().parent.parent / "docs" / "STREAMING.md"


def test_streaming_walkthrough_executes(spark, sf_dir, tmp_path):
    blocks = re.findall(r"```python\n(.*?)```", DOC.read_text(), re.S)
    assert len(blocks) >= 4
    ns = {"spark": spark, "sf_dir": sf_dir, "work_dir": str(tmp_path)}
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f"{DOC.name}#block{i + 1}", "exec"), ns)
        except Exception as e:  # pragma: no cover
            raise AssertionError(f"streaming block {i + 1} failed: {e}") from e
