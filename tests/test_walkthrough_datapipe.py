"""Executes every python block of docs/DATAPIPE.md in order (the
LLM-data-pipeline counterpart of test_walkthrough.py)."""

from __future__ import annotations

import re
from pathlib import Path

DOC = Path(__file__).resolve().parent.parent / "docs" / "DATAPIPE.md"


def test_datapipe_walkthrough_executes(spark, sf_dir):
    blocks = re.findall(r"```python\n(.*?)```", DOC.read_text(), re.S)
    assert len(blocks) >= 5
    ns = {"spark": spark, "sf_dir": sf_dir}
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f"{DOC.name}#block{i + 1}", "exec"), ns)
        except Exception as e:  # pragma: no cover
            raise AssertionError(f"datapipe block {i + 1} failed: {e}") from e
