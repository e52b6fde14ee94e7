#!/usr/bin/env python
"""Dependency-free codestyle gate (the reference gates style with a
flake8 tox env, `/root/reference/tox.ini:75-79`; full linting runs as
ruff in CI — this checker enforces the core rules in any environment,
including ones with no lint tools installed).

Checks, per source line: length <= 88, no trailing whitespace, no tab
indentation, no ``from module import *`` outside ``__init__`` files,
and LF newlines.  Exits non-zero listing every violation.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

MAX_LEN = 88
ROOTS = ("frei_tpu", "tests", "tools", "bench.py", "__graft_entry__.py")
STAR_IMPORT = re.compile(r"^\s*from\s+\S+\s+import\s+\*")


def check_file(path: Path) -> list:
    problems = []
    raw = path.read_bytes()
    if b"\r" in raw:
        problems.append((0, "CRLF/CR line ending"))
    for n, line in enumerate(raw.decode("utf-8").splitlines(), 1):
        if len(line) > MAX_LEN:
            problems.append((n, f"line too long ({len(line)} > {MAX_LEN})"))
        if line != line.rstrip():
            problems.append((n, "trailing whitespace"))
        if line.startswith("\t") or line.lstrip(" ").startswith("\t"):
            problems.append((n, "tab indentation"))
        if STAR_IMPORT.match(line) and path.name != "__init__.py":
            problems.append((n, "star import outside __init__"))
    return problems


def main() -> int:
    repo = Path(__file__).resolve().parent.parent
    failures = 0
    for root in ROOTS:
        p = repo / root
        files = [p] if p.is_file() else sorted(p.rglob("*.py"))
        for f in files:
            for n, msg in check_file(f):
                print(f"{f.relative_to(repo)}:{n}: {msg}")
                failures += 1
    if failures:
        print(f"codestyle: {failures} violation(s)")
        return 1
    print("codestyle: clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
