"""Cross-check BASELINE.md's per-query pin table against the BENCH_r*.json
artifacts it cites.

The 2x bench gate is only auditable if every pinned number matches its
named source file (VERDICT r7 What's-wrong #3 found three rows citing
BENCH_r02 with values from later exclusive re-measurements). This script
parses every ``<sec>s (BENCH_rNN ...)`` citation in the pin table, looks
the row's bench name up in that artifact (both artifact formats: the
structured ``queries`` map and the raw ``tail`` transcript with
``# name: X.XXXs`` lines), and exits non-zero on any mismatch.

Run: ``python tools/check_baseline_pins.py`` (from the repo root).
"""

from __future__ import annotations

import json
import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
TOL = 0.0005  # artifacts print 3 decimals


def artifact_queries(round_no: int) -> dict[str, float]:
    path = ROOT / f"BENCH_r{round_no:02d}.json"
    if not path.exists():
        raise FileNotFoundError(path)
    d = json.loads(path.read_text())
    if isinstance(d.get("queries"), dict):
        return {k: float(v) for k, v in d["queries"].items()}
    parsed = d.get("parsed") or {}
    if isinstance(parsed.get("queries"), dict):
        return {k: float(v) for k, v in parsed["queries"].items()}
    # last resort: the raw transcript — NOTE the driver truncates
    # `tail` from the head, so early names can be missing here
    return {
        name: float(sec)
        for name, sec in re.findall(r"# (\w+): ([\d.]+)s", d.get("tail", ""))
    }


def pin_table_rows(md: str) -> list[tuple[str, str]]:
    """(name, first-value-cell) for every data row of the pin table."""
    rows = []
    in_table = False
    for line in md.splitlines():
        if line.startswith("| name | shape | pinned |"):
            in_table = True
            continue
        if in_table:
            if not line.startswith("|"):
                break
            cells = [c.strip() for c in line.strip("|").split("|")]
            if len(cells) >= 4 and not set(cells[0]) <= {"-"}:
                rows.append((cells[0], cells[3]))
    return rows


def headline_names() -> list[str]:
    """The benched names from bench.py's HEADLINE list (parsed
    textually — importing bench.py would start a SparkSession)."""
    txt = (ROOT / "bench.py").read_text()
    m = re.search(r"HEADLINE = \[(.*?)\n\]", txt, re.S)
    if not m:
        raise RuntimeError("bench.py HEADLINE list not found")
    return re.findall(r'"([^"]+)"', m.group(1))


def main() -> int:
    md = (ROOT / "BASELINE.md").read_text()
    rows = pin_table_rows(md)
    if not rows:
        print("FAIL: no pin table found in BASELINE.md")
        return 1
    checked = failures = 0
    # Every benched name must HAVE a pin row — the r8 hole: a name can
    # be timed for rounds (op_incremental_dedup since r5) while its
    # shape changes go unrecorded, making later drift unjudgeable.
    table_names = {name for name, _ in rows}
    for name in headline_names():
        checked += 1
        if name not in table_names:
            print(f"FAIL  {name}: benched in bench.py HEADLINE but has no "
                  "pin-table row in BASELINE.md")
            failures += 1
    cache: dict[int, dict[str, float]] = {}
    for name, cell in rows:
        for sec_txt, rnd_txt in re.findall(
            r"(\d+\.\d+)s \(BENCH_r(\d+)", cell
        ):
            rnd = int(rnd_txt)
            if rnd not in cache:
                cache[rnd] = artifact_queries(rnd)
            qs = cache[rnd]
            checked += 1
            if name not in qs:
                print(
                    f"FAIL  {name}: cites BENCH_r{rnd:02d} but the "
                    f"artifact has no such query name"
                )
                failures += 1
            elif abs(qs[name] - float(sec_txt)) > TOL:
                print(
                    f"FAIL  {name}: table says {sec_txt}s (BENCH_r{rnd:02d}) "
                    f"but the artifact records {qs[name]:.3f}s"
                )
                failures += 1
            else:
                print(f"ok    {name}: {sec_txt}s == BENCH_r{rnd:02d}")
    print(f"\n{checked} citations checked, {failures} mismatched")
    return 1 if failures or not checked else 0


if __name__ == "__main__":
    sys.exit(main())
