"""Tutorial notebooks stay loadable and their imports stay real.

The reference ships executable notebooks (reference tutorials/
API_Tutorial.ipynb, API_Tutorial_VFS.ipynb, Demo_INASPeechSegmenter.ipynb);
ours mirror them against the TPU package.  Executing them needs network +
released weights, so this test checks the cheap invariants instead: valid
nbformat JSON, and every `import`/`from` line in the code cells resolves
against the installed package (a renamed module would otherwise break the
notebooks silently).
"""

import ast
import importlib
import json
import pathlib

import pytest

TUTORIALS = sorted(
    (pathlib.Path(__file__).resolve().parent.parent / "tutorials").glob(
        "*.ipynb"))

EXTERNAL_OK = {"pandas", "seaborn", "numpy", "jax", "matplotlib"}


def test_tutorials_present():
    names = {p.name for p in TUTORIALS}
    # the reference's three tutorials, mirrored
    assert "API_Tutorial.ipynb" in names
    assert "API_Tutorial_VFS.ipynb" in names
    assert any(n.lower().startswith("demo_") for n in names)


@pytest.mark.parametrize("path", TUTORIALS, ids=lambda p: p.name)
def test_notebook_valid_and_imports_resolve(path):
    nb = json.loads(path.read_text())
    assert nb["nbformat"] == 4
    for cell in nb["cells"]:
        assert cell["cell_type"] in ("markdown", "code")
        src = "".join(cell["source"])
        if cell["cell_type"] != "code":
            continue
        # shell escapes (`! pip install ...`) aren't python; neutralize them
        # in place (a `pass` at the same indentation) rather than dropping
        # the line, so an escape inside an indented block doesn't empty the
        # block and raise an unrelated IndentationError
        py = "\n".join(
            l if not l.lstrip().startswith(("!", "%"))
            else l[:len(l) - len(l.lstrip())] + "pass"
            for l in src.splitlines())
        tree = ast.parse(py)  # code cells must at least parse
        for node in ast.walk(tree):
            mods = []
            if isinstance(node, ast.Import):
                mods = [a.name for a in node.names]
            elif isinstance(node, ast.ImportFrom) and node.level == 0:
                mods = [node.module]
            for mod in mods:
                root = mod.split(".")[0]
                if root in EXTERNAL_OK:
                    continue
                # first-party module paths must import
                importlib.import_module(mod)
