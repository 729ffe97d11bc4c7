"""Published perf numbers must match the newest driver bench artifact.

VERDICT r3 weak-point #2: README/PERF quoted a stale round's numbers.
This gate makes a bench refresh without a doc refresh fail the default
test tier instead of shipping stale figures.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                       / "tools"))


def test_docs_match_latest_bench():
    import sync_docs

    problems = sync_docs.check()
    assert not problems, "\n".join(problems)
