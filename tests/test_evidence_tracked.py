"""Round evidence files must be git-tracked (VERDICT r9 #7, r15 #7).

The driver drops ``BENCH_r{N}.json`` / ``CORRECTNESS_r{N}.json`` into
the repo root each round; four rounds running they sat untracked at
judge time. The original guard failed on ANY untracked evidence file,
which meant it fired by construction at every round open (the driver's
just-dropped current-round files are necessarily untracked until the
first commit), so a red test stopped meaning anything. Per VERDICT r15
#7 the guard now tolerates exactly the *current* round's drops — the
files whose round number equals the max ``r`` seen on disk — and still
fails loudly for any untracked HISTORICAL evidence, where the fix is
always one ``git add`` away instead of a next-round verdict item.
"""

from __future__ import annotations

import glob
import os
import re
import subprocess

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATTERNS = ("BENCH_r*.json", "CORRECTNESS_r*.json")
_ROUND_RE = re.compile(r"_r(\d+)\.json$")


def _round_of(name: str) -> int:
    m = _ROUND_RE.search(name)
    return int(m.group(1)) if m else -1


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
    current_round = max(_round_of(n) for n in on_disk)
    untracked = sorted(
        n for n in on_disk - tracked if _round_of(n) != current_round
    )
    assert not untracked, (
        f"historical round evidence files on disk but not in the git index — "
        f"run `git add {' '.join(untracked)}` and commit (current round "
        f"r{current_round} drops are exempt until the round-open commit)"
    )
