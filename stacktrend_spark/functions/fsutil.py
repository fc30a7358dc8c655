"""Filesystem helpers shared by bench-fixture and roundtrip queries."""

from __future__ import annotations

import atexit
import shutil
import tempfile


def tmpdir(prefix: str) -> str:
    """mkdtemp with atexit cleanup: roundtrip queries legitimately
    time their own write (the write IS the operator), and fixture
    builders write once per process — either way the directories must
    not leak across bench runs (r8 verdict task 4). One shared helper
    so a cleanup-policy change lands everywhere at once (r9 review)."""
    base = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    return base
