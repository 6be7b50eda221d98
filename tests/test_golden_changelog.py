"""Golden-regeneration discipline gate (VERDICT r3 item 6): a commit that
touches tests/golden/e2e/* must also update the CHANGELOG there, stating
WHY the outputs changed.  The reference treats goldens as external truth
(cr_lib/src/testing/correctness.rs:24); silently regenerated goldens gate
nothing."""

import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_REL = "tests/golden/e2e"


def _git(*args):
    return subprocess.run(["git", *args], capture_output=True, text=True,
                          cwd=REPO)


def test_golden_changes_have_changelog_entry():
    if _git("rev-parse", "--git-dir").returncode != 0:
        pytest.skip("not a git checkout")
    if _git("rev-parse", "HEAD~1").returncode != 0:
        pytest.skip("initial commit")
    r = _git("diff", "--name-only", "HEAD~1", "HEAD", "--", GOLDEN_REL)
    changed = [ln for ln in r.stdout.splitlines() if ln.strip()]
    golden_changed = [c for c in changed if not c.endswith("CHANGELOG")]
    if golden_changed:
        assert f"{GOLDEN_REL}/CHANGELOG" in changed, (
            "golden files changed without a CHANGELOG entry in the same "
            f"commit: {golden_changed}.  Regenerate via "
            "tools/make_golden.py --reason '...' and commit the CHANGELOG "
            "with the goldens.")


def test_changelog_exists_and_documents_regens():
    path = os.path.join(REPO, GOLDEN_REL, "CHANGELOG")
    assert os.path.exists(path), "tests/golden/e2e/CHANGELOG missing"
    text = open(path).read()
    assert "reason:" in text
