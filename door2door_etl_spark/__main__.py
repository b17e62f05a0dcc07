"""CLI entry point: ``python -m door2door_etl_spark -s all ...``

Mirrors the reference's executor CLI (reference src/executor.py:12-31 — a
click command with ``-s/--step`` in {all, ingestor, handler} and
``-w/--workflow`` to resume a staged ingest), plus the source/lake locations
the reference hard-codes via environment variables.  stdlib argparse — no
extra dependency.

Examples:
    python -m door2door_etl_spark -s all \
        --source '/lake/landing/dt=2022-11-24/*.json' --lake-root /lake
    python -m door2door_etl_spark -s handler -w <workflow-uuid> --lake-root /lake
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="door2door_etl_spark",
        description="Run the incremental ingest workflow (ingestor -> handler).",
    )
    parser.add_argument(
        "-s", "--step", default="all", choices=["all", "ingestor", "handler"],
        help="which step(s) to run (reference: executor.py -s)",
    )
    parser.add_argument(
        "-w", "--workflow-id", default=None,
        help="workflow id; required for a bare handler run (reference: executor.py -w)",
    )
    parser.add_argument("--source", default=None, help="landing JSONL glob")
    parser.add_argument("--lake-root", required=True, help="lake root directory")
    parser.add_argument(
        "--fetch-hour", default=None,
        help="ISO hour to ingest (default: watermark + 1h, cold start "
             "2022-11-24T10:00 like the reference)",
    )
    args = parser.parse_args(argv)

    if args.step in ("all", "ingestor") and not args.source:
        parser.error("--source is required when running the ingestor")

    from door2door_etl_spark.pipeline import run_workflow
    from door2door_etl_spark.session import build_session

    fetch_hour = (
        dt.datetime.fromisoformat(args.fetch_hour) if args.fetch_hour else None
    )
    spark = build_session(app_name="door2door-etl")
    try:
        summary = run_workflow(
            spark,
            args.source or "",
            args.lake_root,
            step=args.step,
            workflow_id=args.workflow_id,
            fetch_hour=fetch_hour,
        )
    except ValueError as exc:  # arg-combo errors exit(1) like the reference
        print(f"error: {exc}", file=sys.stderr)
        return 1
    finally:
        spark.stop()
    print(json.dumps(summary, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
