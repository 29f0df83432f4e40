"""bench.py transient-backend retry guard.

bench.py's module import probes the TPU backend (and imports jax), so the
retry helper is extracted from the source AST and exercised standalone —
the contract under test is pure control flow: re-exec ONLY on a transient
UNAVAILABLE error and only a bounded number of times.
"""

import ast
import os
import sys
import time
from pathlib import Path

import pytest

BENCH = Path(__file__).resolve().parent.parent / "bench.py"


def _load_retry_exec():
    tree = ast.parse(BENCH.read_text())
    fn = next(n for n in tree.body
              if isinstance(n, ast.FunctionDef) and n.name == "_retry_exec")
    ns = {"os": os, "sys": sys, "time": time, "print": print}
    exec(compile(ast.Module(body=[fn], type_ignores=[]), str(BENCH), "exec"),
         ns)
    return ns["_retry_exec"]


@pytest.fixture()
def retry_exec(monkeypatch):
    calls = []
    monkeypatch.setattr(os, "execv", lambda *a: calls.append(a))
    monkeypatch.setattr(time, "sleep", lambda s: None)
    monkeypatch.delenv("EE_BENCH_EXEC_ATTEMPT", raising=False)
    return _load_retry_exec(), calls


def test_unavailable_reexecs_with_incremented_attempt(retry_exec):
    fn, calls = retry_exec
    fn(RuntimeError("UNAVAILABLE: TPU backend setup/compile error"))
    assert len(calls) == 1
    assert calls[0][0] == sys.executable
    assert os.environ["EE_BENCH_EXEC_ATTEMPT"] == "1"


def test_non_transient_error_reraises(retry_exec):
    fn, calls = retry_exec
    with pytest.raises(ValueError, match="shape mismatch"):
        fn(ValueError("shape mismatch"))
    assert not calls


def test_attempts_are_bounded(retry_exec):
    fn, calls = retry_exec
    os.environ["EE_BENCH_EXEC_ATTEMPT"] = "2"
    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        fn(RuntimeError("UNAVAILABLE: tunnel down"))
    assert not calls
