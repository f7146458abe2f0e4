"""CLI: ``python -m xetl_spark <manifest> [-c cmds] [--dryrun]``.

Reference parity (xetl/__main__.py:12-63): manifest path argument,
--commands subset, --dryrun; exits non-zero with the failing stage's
error. Log style maps to plain/verbose logging instead of the
reference's box-drawing decorations (SURVEY.md: cosmetic non-goal).
"""

from __future__ import annotations

import argparse
import logging
import sys


def argument_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="xetl_spark",
        description="Run a Spark pipeline job manifest",
    )
    p.add_argument("manifest", help="path to the job YAML manifest")
    p.add_argument(
        "-c",
        "--commands",
        help="comma-separated subset of commands to run (job order preserved)",
    )
    p.add_argument(
        "--dryrun",
        action="store_true",
        help="print the resolved manifest and per-stage plans; execute nothing",
    )
    p.add_argument(
        "-l",
        "--log-style",
        choices=["minimal", "moderate", "gaudy"],
        default="moderate",
        help="log verbosity style",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = argument_parser().parse_args(argv)
    logging.basicConfig(
        level=logging.DEBUG if args.log_style == "gaudy" else logging.INFO,
        format="%(levelname)s %(name)s: %(message)s"
        if args.log_style != "minimal"
        else "%(message)s",
    )

    import os

    if not os.path.isfile(args.manifest):
        print(f"error: manifest not found: {args.manifest}", file=sys.stderr)
        return 1

    from xetl_spark.plans.models import Job
    from xetl_spark.plans.runner import TaskFailure, explain_job, run_job
    from xetl_spark.session import get_session

    job = Job.from_file(args.manifest)
    spark = get_session(f"xetl:{job.name}")
    if args.dryrun:
        print(explain_job(spark, job))
        return 0
    try:
        results = run_job(spark, job, commands=args.commands)
    except TaskFailure as tf:
        print(f"error: {tf}", file=sys.stderr)
        return 2
    for r in results:
        label = r.command.name or r.command.task
        print(f"{label}: {r.status}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
