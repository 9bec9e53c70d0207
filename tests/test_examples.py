"""Examples can't rot: every examples/*.py must parse and its neuralpde_tpu
imports must resolve.  (Full runs happen out-of-CI — the scripts are
full-budget TPU workloads — but name-level rot is caught here.)"""

import ast
import os

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def _scripts():
    return sorted(f for f in os.listdir(EXAMPLES) if f.endswith(".py"))


@pytest.mark.parametrize("script", _scripts())
def test_example_parses_and_imports_resolve(script):
    src = open(os.path.join(EXAMPLES, script)).read()
    tree = ast.parse(src)

    import neuralpde_tpu

    missing = []
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module and \
                node.module.split(".")[0] == "neuralpde_tpu":
            mod = __import__(node.module, fromlist=["_"])
            for alias in node.names:
                if not hasattr(mod, alias.name):
                    missing.append(f"{node.module}.{alias.name}")
    assert not missing, f"{script}: unresolved imports {missing}"
