"""Driver-contract tests for __spark_entry__: registry shape and the
never-checked-first rotation that feeds the driver's 50-query gate."""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry


def test_oracle_keys_subset_of_queries():
    q, o = entry.queries(), entry.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 160
    # The rows-only set is EMPTY as of r6: every registered query is
    # oracle-backed. Graduation history: q40/q84 in r4 (explicit-register
    # HLL replay), q80 in r5 (GK exact replay), q47 and q115 in r6 (full
    # k-means-quantizer / PQ-codebook SQL replay, enabled by
    # sequential-fold float accumulation on the Spark side).
    assert set(q) - set(o) == set()


def test_rotation_puts_unchecked_first(tmp_path, monkeypatch):
    """queries() must order changed-this-round queries (_REVERIFY) first,
    then never-hash-green queries, then green ones, reading whatever
    CORRECTNESS_r*.json files sit next to the module."""
    names = list(entry.queries())
    # the re-verify block leads, in its declared order
    reverify = entry._reverify()
    assert names[: len(reverify)] == [n for n in reverify if n in names]
    checked = entry._driver_checked() - set(reverify)
    if not checked:  # fresh checkout: order is registry order, nothing to assert
        return
    # every unchecked name precedes every checked name
    first_checked = min(i for i, n in enumerate(names) if n in checked)
    assert all(n in checked for n in names[first_checked:]), (
        "a never-checked query sits after the checked block"
    )
    # a name counts as checked iff hash-green in AT LEAST one round;
    # rows-only/no_oracle rows alone must NOT mark it checked
    green, seen = set(), set()
    for p in __import__("glob").glob("/root/repo/CORRECTNESS_r*.json"):
        for name, row in json.load(open(p)).items():
            seen.add(name)
            if isinstance(row, dict) and row.get("hash_match") is True:
                green.add(name)
    assert checked == green - set(entry._reverify())
    for name in seen - green:
        assert name not in checked


def test_rotation_survives_corrupt_correctness_file(tmp_path, monkeypatch):
    """A malformed CORRECTNESS file must not break queries()."""
    import os
    import shutil

    workdir = tmp_path / "repo"
    workdir.mkdir()
    # point the module at a directory with one valid and one corrupt file
    (workdir / "CORRECTNESS_r01.json").write_text(
        json.dumps({"q01_pricing_summary": {"hash_match": True}})
    )
    (workdir / "CORRECTNESS_r02.json").write_text("{not json")
    real_file = entry.__file__
    monkeypatch.setattr(entry, "__file__", str(workdir / "__spark_entry__.py"))
    try:
        names = list(entry.queries())
        assert len(names) >= 160
        # the single checked query must land at the very BACK of the order
        assert names[-1] == "q01_pricing_summary"
    finally:
        monkeypatch.setattr(entry, "__file__", real_file)


def test_reverify_self_clears_after_regreen(tmp_path, monkeypatch):
    """A changed query drops out of the re-verify front block as soon as
    a round AFTER the change records it hash-green; older greens do not
    clear it."""
    import json
    import os

    name = next(iter(entry._CHANGED_AFTER_ROUND))
    changed_rnd = entry._CHANGED_AFTER_ROUND[name]
    real_dir = os.path.dirname(os.path.abspath(entry.__file__))

    def fake_dirname(_):
        return str(tmp_path)

    monkeypatch.setattr(entry.os.path if hasattr(entry, "os") else __import__("os").path,
                        "dirname", fake_dirname, raising=False)
    # green in the SAME round as the change -> still needs re-verify
    (tmp_path / f"CORRECTNESS_r{changed_rnd:02d}.json").write_text(
        json.dumps({name: {"hash_match": True}})
    )
    assert name in entry._reverify()
    # green in a LATER round -> cleared
    (tmp_path / f"CORRECTNESS_r{changed_rnd + 1:02d}.json").write_text(
        json.dumps({name: {"hash_match": True}})
    )
    assert name not in entry._reverify()
    monkeypatch.undo()
    assert os.path.dirname(os.path.abspath(entry.__file__)) == real_dir


def test_changed_after_round_has_no_duplicate_keys():
    """A query changed in two different rounds must keep only the newest
    entry: a duplicate key in the dict LITERAL silently resolves to
    whichever line comes last (this bit r9 — three value-9 entries were
    downgraded by stale value-7 lines further down)."""
    import ast

    src = open(entry.__file__).read()
    tree = ast.parse(src)
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and any(
            getattr(t, "id", None) == "_CHANGED_AFTER_ROUND" for t in node.targets
        ):
            keys = [k.value for k in node.value.keys if isinstance(k, ast.Constant)]
            dupes = {k for k in keys if keys.count(k) > 1}
            assert not dupes, f"duplicate _CHANGED_AFTER_ROUND keys: {dupes}"
            break
    else:
        raise AssertionError("_CHANGED_AFTER_ROUND literal not found")


def test_reverify_waits_for_its_gate_round(tmp_path, monkeypatch):
    """A query changed at the END of round V (value V) must NOT front
    while the latest recorded gate is < V — round V's slice was
    budgeted for never-sampled queries — and must front once the
    round-V gate is recorded (then clear on a round > V green)."""
    import json

    candidates = [n for n, v in entry._CHANGED_AFTER_ROUND.items() if v >= 9]
    if not candidates:
        return  # no end-of-round-changed entries at this point in history
    name = candidates[0]
    v = entry._CHANGED_AFTER_ROUND[name]

    def fake_dirname(_):
        return str(tmp_path)

    monkeypatch.setattr(
        entry.os.path if hasattr(entry, "os") else __import__("os").path,
        "dirname",
        fake_dirname,
        raising=False,
    )
    # green BEFORE the change, gate for round v not yet recorded -> wait
    (tmp_path / f"CORRECTNESS_r{v - 1:02d}.json").write_text(
        json.dumps({name: {"hash_match": True}})
    )
    assert name not in entry._reverify()
    # the round-v gate has been recorded (sampling other queries) -> front
    (tmp_path / f"CORRECTNESS_r{v:02d}.json").write_text(
        json.dumps({"q01_pricing_summary": {"hash_match": True}})
    )
    assert name in entry._reverify()
    # a green in a round AFTER the change -> cleared
    (tmp_path / f"CORRECTNESS_r{v + 1:02d}.json").write_text(
        json.dumps({name: {"hash_match": True}})
    )
    assert name not in entry._reverify()
    monkeypatch.undo()


def test_rotation_survives_non_dict_correctness_json(tmp_path, monkeypatch):
    """A CORRECTNESS file holding a JSON ARRAY (valid JSON, wrong shape)
    must be skipped by both rotation helpers, not crash queries()."""
    import json
    import os
    import shutil

    import __spark_entry__ as entry

    here = os.path.dirname(os.path.abspath(entry.__file__))
    src = os.path.join(here, "__spark_entry__.py")
    work = tmp_path / "repo"
    work.mkdir()
    shutil.copy(src, work / "__spark_entry__.py")
    (work / "CORRECTNESS_r99.json").write_text(json.dumps([{"q": 1}]))
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_isolated", work / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    q = mod.queries()  # must not raise
    assert len(q) == len(entry.queries())
