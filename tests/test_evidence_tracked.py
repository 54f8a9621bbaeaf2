"""Round evidence files must be git-tracked (VERDICT r9 #7).

The driver drops ``BENCH_r{N}.json`` / ``CORRECTNESS_r{N}.json`` into
the repo root each round; four rounds running they sat untracked at
judge time. This makes the slip mechanical: any pytest run (the
round-close checklist's first step) fails loudly while an evidence
file on disk is missing from the git index, so the fix is always one
``git add`` away instead of a next-round verdict item.
"""

from __future__ import annotations

import glob
import os
import subprocess

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATTERNS = ("BENCH_r*.json", "CORRECTNESS_r*.json")


def test_round_evidence_files_are_tracked():
    on_disk = {
        os.path.basename(p)
        for pat in PATTERNS
        for p in glob.glob(os.path.join(REPO_ROOT, pat))
    }
    assert on_disk, "no evidence files found — wrong repo root?"
    ls = subprocess.run(
        ["git", "ls-files", *PATTERNS],
        cwd=REPO_ROOT,
        capture_output=True,
        text=True,
        timeout=30,
    )
    assert ls.returncode == 0, ls.stderr
    tracked = set(ls.stdout.split())
    untracked = sorted(on_disk - tracked)
    assert not untracked, (
        f"round evidence files on disk but not in the git index — "
        f"run `git add {' '.join(untracked)}` and commit"
    )
