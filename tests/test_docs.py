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


def test_sync_docs_write_heals_new_artifact(tmp_path):
    # The driver records BENCH_r{N}.json AFTER the round's last commit,
    # so the final artifact of a final round can never be hand-synced:
    # --write must regenerate the marker-delimited headline blocks
    # mechanically and bring check() back to green.
    import json
    import shutil

    import sync_docs

    repo = pathlib.Path(__file__).resolve().parent.parent
    work = tmp_path / "repo"
    (work / "docs").mkdir(parents=True)
    shutil.copy(repo / "README.md", work / "README.md")
    shutil.copy(repo / "docs" / "PERF.md", work / "docs" / "PERF.md")
    newest = sync_docs.latest_bench(repo)
    assert newest is not None, "driver artifacts missing from repo"
    parsed = dict(newest[1])
    parsed.update({"value": 712.34, "vs_baseline": 101.76,
                   "worst_orbit": 698.7, "single_batch_median": 600.12,
                   "baseline_cpp_mrays": 7.0})
    (work / f"BENCH_r{newest[0] + 1:02d}.json").write_text(
        json.dumps({"parsed": parsed}))
    assert sync_docs.check(work), "stale artifact not detected"
    sync_docs.write(work)
    assert sync_docs.check(work) == []
    assert "712.34" in (work / "README.md").read_text()
    assert "101.76" in (work / "docs" / "PERF.md").read_text()
