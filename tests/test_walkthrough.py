"""Executes every python block of docs/WALKTHROUGH.md in order, in one
namespace (so the document IS a test — the repo's answer to the
reference's doc/notebooks/load_ndvi_qa.ipynb)."""

from __future__ import annotations

import re
from pathlib import Path

DOC = Path(__file__).resolve().parent.parent / "docs" / "WALKTHROUGH.md"


def test_walkthrough_executes(spark, tmp_path):
    blocks = re.findall(r"```python\n(.*?)```", DOC.read_text(), re.S)
    assert len(blocks) >= 5
    ns = {"spark": spark, "tmp_path": tmp_path}
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f"{DOC.name}#block{i + 1}", "exec"), ns)
        except Exception as e:  # pragma: no cover
            raise AssertionError(f"walkthrough block {i + 1} failed: {e}") from e
