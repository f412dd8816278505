"""Guard against rot in the example/script CLIs: every entry must at least
byte-compile (the workflows themselves are exercised behaviourally by
test_pipeline_e2e.py / test_fcd_stl.py / test_export.py)."""

import glob
import py_compile

import pytest

FILES = sorted(glob.glob("/root/repo/examples/*.py")
               + glob.glob("/root/repo/scripts/*.py")
               + ["/root/repo/bench.py", "/root/repo/__graft_entry__.py"])


@pytest.mark.parametrize("path", FILES, ids=lambda p: p.rsplit("/", 1)[-1])
def test_compiles(path):
    py_compile.compile(path, doraise=True)
