#!/usr/bin/env python
"""Maintain QUERY_HASHES.json — the per-query source hashes behind the
driver-ordering "changed since last sampled" tier (r8 judge ask #3:
staleness-only ordering sent queries whose implementation or oracle
changed in a round to the BACK of the next round's sample queue, so
their green driver status described old code).

Each entry is ``name -> {"hash": <16-hex>, "round": N}``: the query's
source hash AS OF the tree the driver sampled in round N (the parent
commit of "round N: verdict/advice/correctness/bench", which is the
end-of-round snapshot the driver tested). plans/catalog.py compares the
recorded hash against the current tree at ordering time and front-loads
mismatches.

Regeneration is ALWAYS git-based: for each query, the hash extraction
replays against the git tree of its last-sampled round (no imports of
old code — the extraction is purely textual, see
catalog._source_hashes_from_files), so re-running at any time is
idempotent and correct. (A "stamp the latest round's samples with the
WORKING tree's hashes" fast path was considered and rejected: at round
close the working tree already carries the next round's edits, so it
would silently mark just-changed queries as freshly verified.)

The hash function lives in plans/catalog.py (single implementation; this
tool only changes which FILE TEXTS it runs over).
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from sdg_big_data_spark.plans.catalog import (  # noqa: E402
    _HASH_SRC_DIRS,
    _source_hashes_from_files,
    current_query_hashes,
)

HASHES_PATH = ROOT / "QUERY_HASHES.json"


def _latest_samples() -> tuple[int, dict[str, tuple[int, bool]]]:
    """(latest_round, name -> (last_sampled_round, passed))."""
    last: dict[str, tuple[int, bool]] = {}
    latest = 0
    for path in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        latest = max(latest, rnd)
        data = json.loads(path.read_text())
        for name, rec in data.items():
            if not isinstance(rec, dict):
                continue
            ok = bool(rec.get("hash_match")) or (
                not rec.get("err")
                and rec.get("rows_match")
                and rec.get("schema_match")
            )
            prev = last.get(name)
            if prev is None or rnd >= prev[0]:
                last[name] = (rnd, ok)
    return latest, last


def _round_commit(rnd: int) -> str | None:
    """The tree the driver sampled in round ``rnd``: the parent of that
    round's record commit."""
    out = subprocess.run(
        ["git", "log", "--format=%H %s"],
        cwd=ROOT, capture_output=True, text=True, check=True,
    ).stdout
    for line in out.splitlines():
        sha, _, subject = line.partition(" ")
        if re.match(rf"round {rnd}: verdict", subject):
            return f"{sha}^"
    return None


def _files_at(commit: str) -> dict[str, str]:
    ls = subprocess.run(
        ["git", "ls-tree", "-r", "--name-only", commit, "sdg_big_data_spark"],
        cwd=ROOT, capture_output=True, text=True, check=True,
    ).stdout.splitlines()
    files: dict[str, str] = {}
    for path in ls:
        parts = path.split("/")
        if (
            path.endswith(".py")
            and len(parts) == 3
            and parts[1] in _HASH_SRC_DIRS
        ):
            files[path] = subprocess.run(
                ["git", "show", f"{commit}:{path}"],
                cwd=ROOT, capture_output=True, text=True, check=True,
            ).stdout
    return files


def load() -> dict:
    try:
        return json.loads(HASHES_PATH.read_text())
    except (OSError, ValueError):
        return {}


def save(entries: dict) -> None:
    HASHES_PATH.write_text(
        json.dumps(dict(sorted(entries.items())), indent=1) + "\n"
    )


def seed() -> int:
    latest, samples = _latest_samples()
    rounds = sorted({rnd for rnd, _ in samples.values()})
    all_rounds = list(range(min(rounds), latest + 1))
    per_round: dict[int, dict[str, str]] = {}
    for rnd in all_rounds:
        commit = _round_commit(rnd)
        if commit is None:
            print(f"round {rnd}: no record commit found — skipped")
            continue
        per_round[rnd] = _source_hashes_from_files(_files_at(commit))
    current = current_query_hashes()
    entries = load()
    seeded = missing = 0
    for name, (rnd, _ok) in sorted(samples.items()):
        h = per_round.get(rnd, {}).get(name)
        if h is None:
            # not extractable at that tree (renamed since, or commit
            # missing) — leave unrecorded: catalog ranks it "changed",
            # the conservative direction
            missing += 1
            continue
        entries[name] = {"hash": h, "round": rnd}
        if h != current.get(name):
            # the round whose tree FIRST carries the current source —
            # i.e. when the change landed; never seen in any recorded
            # tree => changed in the in-flight round. Drives the
            # most-recently-changed-first order within the rank-1 tier.
            entries[name]["changed_in"] = min(
                (
                    r
                    for r in all_rounds
                    if per_round.get(r, {}).get(name) == current.get(name)
                ),
                default=latest + 1,
            )
        seeded += 1
    save(entries)
    print(f"seeded {seeded}, unrecorded {missing} (rank as changed)")
    return 0


if __name__ == "__main__":
    raise SystemExit(seed())
