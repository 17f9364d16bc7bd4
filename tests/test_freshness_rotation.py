"""Freshness-rotation affected-set selection (tools/oracle_check.py).

The rotation's evidence value depends on `pick_changed` actually seeing
every kind of edit: r9 fixed the uncommitted-worktree blind spot, r10/r11
the UNTRACKED-file blind spot (`git diff <ref>` omits files never
`git add`ed, so a brand-new plan module would silently skip the
rotation).  These tests pin both behaviors with real files against the
real git repo -- no mocking -- so a regression in the git plumbing shows
up as a test failure, not a silently-empty affected set.
"""

from __future__ import annotations

import importlib
import subprocess
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT / "tools"))

PKG = "state_economics_end_to_end_data_pipeline_spark"
PROBE_REL = f"{PKG}/plans/_untracked_rotation_probe.py"

PROBE_SRC = '''\
"""Throwaway module created by test_freshness_rotation; never committed."""


def _untracked_probe_entry(spark, sf_dir):
    raise NotImplementedError("rotation-selection probe, never executed")


def _untracked_probe_symbol_xyzzy():
    raise NotImplementedError
'''


def _git(*argv: str) -> str:
    return subprocess.run(
        ["git", *argv], cwd=REPO_ROOT, capture_output=True, text=True, check=True
    ).stdout


def test_pick_changed_sees_untracked_plan_file():
    """A freshly-created, never-`git add`ed plan module must land in the
    affected set -- both its OWN entries (module-path branch) and other
    entries whose source references a symbol it defines (symbol branch).
    This is the r11 verdict ask #1 regression test for the
    `git ls-files --others --exclude-standard` union in pick_changed."""
    from oracle_check import pick_changed

    probe = REPO_ROOT / PROBE_REL
    assert not probe.exists(), "stale probe file left behind; remove it"
    try:
        probe.write_text(PROBE_SRC)
        # confirm the premise: the file is untracked, invisible to `git diff`
        assert PROBE_REL not in _git("diff", "--name-only", "HEAD").split()
        assert PROBE_REL in _git(
            "ls-files", "--others", "--exclude-standard"
        ).split()

        mod_name = f"{PKG}.plans._untracked_rotation_probe"
        mod = importlib.import_module(mod_name)
        try:
            # an entry DEFINED in the untracked module (module-path branch)
            def referencing_entry(spark, sf_dir):
                return _untracked_probe_symbol_xyzzy()  # noqa: F821

            qs = {
                "probe_own_entry": mod._untracked_probe_entry,
                # an entry in ANOTHER module whose source references a
                # symbol the untracked file defines (symbol branch)
                "probe_referencing_entry": referencing_entry,
                # an unrelated entry that must NOT be selected as affected
                "probe_unrelated_entry": _unrelated_entry,
            }
            affected, ever = pick_changed(qs, "HEAD", evergreens=0)
            assert "probe_own_entry" in affected, affected
            assert "probe_referencing_entry" in affected, affected
            assert "probe_unrelated_entry" not in affected, affected
            assert ever == []
        finally:
            sys.modules.pop(mod_name, None)
    finally:
        probe.unlink(missing_ok=True)
        for pyc in (REPO_ROOT / PKG / "plans" / "__pycache__").glob(
            "_untracked_rotation_probe*"
        ):
            pyc.unlink(missing_ok=True)


def _unrelated_entry(spark, sf_dir):
    raise NotImplementedError


def test_pick_changed_clean_tree_selects_only_evergreens():
    """With no package edits beyond whatever the worktree already holds,
    the evergreen slice is deterministic for a fixed ref+round count and
    drawn only from unaffected entries."""
    from oracle_check import pick_changed

    qs = {f"entry_{i}": _unrelated_entry for i in range(12)}
    a1, e1 = pick_changed(qs, "HEAD", evergreens=4)
    a2, e2 = pick_changed(qs, "HEAD", evergreens=4)
    assert e1 == e2 and len(e1) == 4
    assert set(e1) <= set(qs) and not set(e1) & set(a1)
    assert a1 == a2
