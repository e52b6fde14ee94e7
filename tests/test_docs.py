"""Executable documentation.

The reference runs its Sphinx docs as doctests in CI
(`/root/reference/setup.cfg:36-40` sets ``--doctest-rst`` over
``docs/``, so the quickstart in `docs/index.rst:10-41` is an
integration test).  Here every fenced ```python block in ``docs/*.md``
executes top-to-bottom in a shared per-file namespace; blocks that
need the network or external data are opted out with an HTML comment
``<!-- skip-exec -->`` on the line above the fence.
"""

import os
import re
from pathlib import Path

import pytest

os.environ.setdefault("MPLBACKEND", "Agg")

DOCS = sorted((Path(__file__).resolve().parent.parent / "docs").glob("*.md"))
_FENCE_OPEN = re.compile(r"^```python\s*$")


def extract_blocks(text):
    """Yield (code, skip, first_lineno) for each ```python fence."""
    lines = text.splitlines()
    blocks = []
    i = 0
    while i < len(lines):
        if _FENCE_OPEN.match(lines[i]):
            skip = any("skip-exec" in lines[j]
                       for j in range(max(0, i - 2), i))
            j = i + 1
            body = []
            while j < len(lines) and not lines[j].startswith("```"):
                body.append(lines[j])
                j += 1
            blocks.append(("\n".join(body), skip, i + 2))
            i = j + 1
        else:
            i += 1
    return blocks


def test_docs_exist():
    assert DOCS, "docs/ has no markdown pages"


def test_api_doc_covers_public_symbols():
    """Every symbol the package exports must at least be NAMED in
    docs/api.md — an export with zero documentation is a docs
    regression (the reference documents its whole public surface
    through Sphinx autodoc)."""
    import frei_tpu
    text = (Path(__file__).resolve().parent.parent
            / "docs" / "api.md").read_text()
    missing = [s for s in frei_tpu.__all__ if s not in text]
    assert not missing, f"public symbols absent from docs/api.md: {missing}"


#: docs whose executable blocks run multi-minute solves / chemistry
#: table builds — marked slow so the default CI lane stays fast
_SLOW_DOCS = {"quickstart.md", "chemistry.md", "scaling.md",
              "opacities.md", "retrieval.md"}


@pytest.mark.parametrize(
    "doc",
    [pytest.param(p, marks=pytest.mark.slow) if p.name in _SLOW_DOCS
     else p for p in DOCS],
    ids=lambda p: p.name)
def test_doc_executes(doc, tmp_path, monkeypatch):
    blocks = extract_blocks(doc.read_text())
    runnable = [b for b in blocks if not b[1]]
    if not runnable:
        pytest.skip(f"{doc.name}: no executable blocks")
    # Optional-extra imports (pyproject [project.optional-dependencies])
    # gate the page, not fail it: a clean `pip install -e .[test]` env
    # without e.g. optax must skip retrieval.md, not error.
    for mod in ("optax", "matplotlib", "astropy"):
        if any(re.search(rf"^\s*(import|from)\s+{mod}\b", code,
                         re.MULTILINE) for code, _, _ in runnable):
            pytest.importorskip(mod)
    monkeypatch.chdir(tmp_path)  # sandbox any file output
    ns = {}
    for code, _, lineno in runnable:
        exec(compile(code, f"{doc}:{lineno}", "exec"), ns)
