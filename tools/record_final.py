#!/usr/bin/env python
"""Promote a rolling bench artifact to an IMMUTABLE per-round final record.

Round 8 lesson: a later commit silently overwrote ``r08_sf0.1_final.json``
(quiet-window 106.2s -> co-tenant-loaded 133.0s) while the docs still cited
the quiet number, poisoning every round-over-round delta computed from the
artifact.  Final records are history, not working state — this tool is the
ONLY sanctioned way to write one, and it refuses to touch an existing file.

Usage:
    python tools/record_final.py bench_results/bench_full_sf0.1.json r09_sf0.1_final
    python tools/record_final.py bench_results/bench_full_sf0.1.json r09_sf0.1_final --note "quiet window, load avg 0.2"

If ``bench_results/<name>.json`` already exists the tool exits non-zero and
tells you to pick a versioned name (``<name>_v2`` ...) instead.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def record_final(src: Path, name: str, note: str | None = None) -> Path:
    """Copy ``src`` to ``bench_results/<name>.json``; raise if the target
    exists (final records are append-only history)."""
    if not name.replace("_", "").replace(".", "").isalnum():
        raise ValueError(f"suspicious final-record name: {name!r}")
    dst = REPO / "bench_results" / f"{name}.json"
    if dst.exists():
        raise FileExistsError(
            f"{dst} already exists — final records are immutable; pick a "
            f"versioned name (e.g. {name}_v2) instead of overwriting"
        )
    record = json.loads(src.read_text())
    if note:
        record["note"] = note
    dst.write_text(json.dumps(record, indent=1))
    return dst


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src", type=Path, help="rolling artifact to promote")
    ap.add_argument("name", help="final record name (no .json suffix)")
    ap.add_argument("--note", default=None, help="provenance note to embed")
    args = ap.parse_args()
    try:
        dst = record_final(args.src, args.name, args.note)
    except (FileExistsError, ValueError) as exc:
        print(f"REFUSED: {exc}", file=sys.stderr)
        return 1
    print(f"recorded {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
