"""Guard the smoke-tier budget bookkeeping (VERDICT r4 weak #4).

conftest.SLOW_TESTS pushes individually-slow tests out of the
`-m "not slow"` smoke tier by NAME. A rename would silently re-admit a
60-second test into the smoke path, so this (fast) test asserts every
listed name still resolves to a collected test in its module.
"""

import ast
import os

from conftest import SLOW_MODULES, SLOW_TESTS

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))


def _declared_tests(module):
    """Test names defined in tests/<module>.py, including parametrize ids
    reduced to their base function name."""
    path = os.path.join(TESTS_DIR, module + ".py")
    tree = ast.parse(open(path).read())
    return {n.name for n in ast.walk(tree)
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
            and n.name.startswith("test_")}


def test_slow_test_names_exist():
    stale = []
    for module, names in SLOW_TESTS.items():
        assert module not in SLOW_MODULES, (
            f"{module} is already wholesale-slow; per-test entries are dead")
        declared = _declared_tests(module)
        for name in names:
            base = name.split("[")[0]
            if base not in declared:
                stale.append(f"{module}::{name}")
    assert not stale, (
        "SLOW_TESTS names no longer exist (renamed?) — these tests would "
        f"re-enter the smoke tier unmarked: {stale}")
