"""Sequential job executor.

Reference parity (xetl/models/job.py:146-214, command.py:70-86,
task.py:291-347): command filtering, data-dir guard, fail-fast
pre-validation of EVERY command before any execution, sequential loop,
skip-but-still-resolvable stages, dry-run, TaskFailure abort.

Spark-first differences (SURVEY.md §4.2): stage results are lazy
DataFrames registered as temp views — Catalyst fuses across stages (an
improvement over the reference's per-command file materialization);
a stage opts into materialization with MATERIALIZE=true, writing
parquet under the job's data dir. Dry-run prints the fully-resolved
manifest plus each stage's ``explain`` instead of argv/env dumps.
"""

from __future__ import annotations

import logging
import re
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from xetl_spark.plans.models import (
    Command,
    EnvValue,
    Job,
    JobDataDirectoryNotFound,
    fuzzy_eq,
)
from xetl_spark.plans.registry import BUILTINS, TaskRegistry

log = logging.getLogger("xetl_spark.runner")


class TaskFailure(RuntimeError):
    """A stage raised; carries the failed command for CLI exit codes
    (reference command.py:85-86, __main__.py:61-63)."""

    def __init__(self, command: Command, cause: Exception):
        super().__init__(f"command {command.name or command.task!r} failed: {cause}")
        self.command = command
        self.cause = cause


@dataclass
class StageContext:
    """What a task implementation sees: the session, its resolved env,
    the job, and every prior stage's output by name."""

    spark: SparkSession
    job: Job
    command: Command
    env: dict[str, EnvValue]
    outputs: dict[str, DataFrame] = field(default_factory=dict)
    previous: DataFrame | None = None

    def input_df(self, key: str = "INPUT") -> DataFrame:
        """Resolve a stage input: env[key] naming a prior stage, else
        the immediately preceding stage's output."""
        ref = self.env.get(key)
        if ref is not None:
            for name, df in self.outputs.items():
                if fuzzy_eq(name, str(ref)):
                    return df
            raise KeyError(
                f"{key}={ref!r} does not name an earlier stage "
                f"(have: {sorted(self.outputs)})"
            )
        if self.previous is None:
            raise KeyError(
                f"stage {self.command.name or self.command.task!r} needs "
                f"{key} or a preceding stage"
            )
        return self.previous

    def sql(self, template: str) -> DataFrame:
        """Run SQL with prior stage outputs visible as temp views and
        ``{ENV_KEY}`` template substitution."""
        for name, df in self.outputs.items():
            df.createOrReplaceTempView(name)
        rendered = re.sub(
            r"\{([A-Z][A-Z0-9_]*)\}",
            lambda m: str(self.env.get(m.group(1), m.group(0))),
            template,
        )
        return self.spark.sql(rendered)


@dataclass
class StageResult:
    command: Command
    status: str  # "success" | "skipped" | "filtered" | "dryrun"
    output: DataFrame | None = None


def _filter_commands(job: Job, commands: str | list[str] | None) -> list[Command]:
    """--commands selection: named subset, in JOB order regardless of
    the filter's order; fuzzy name matching (reference job.py:146-157,
    188-193)."""
    if commands is None:
        return list(job.commands)
    wanted = (
        [c.strip() for c in commands.split(",")]
        if isinstance(commands, str)
        else list(commands)
    )
    out = []
    for cmd in job.commands:
        if cmd.name and any(fuzzy_eq(cmd.name, w) for w in wanted):
            out.append(cmd)
        else:
            log.info("Skipping command %s", cmd.name or cmd.task)
    return out


def run_job(
    spark: SparkSession,
    job: Job,
    commands: str | list[str] | None = None,
    dryrun: bool = False,
    registry: TaskRegistry | None = None,
    resume: bool = False,
) -> list[StageResult]:
    """Execute the job sequentially with fail-fast validation.

    Execution order mirrors the reference (job.py:175-207): discover
    tasks → data-dir guard (skipped on dry-run) → validate every
    selected command against its task's env interface BEFORE running
    anything → sequential loop; skip:true stages are not executed but
    their (already-resolved) env stays referenceable.

    ``resume=True``: a MATERIALIZE=true stage whose checkpoint already
    exists under ``<data>/_stages/<name>`` is restored from parquet
    instead of recomputed — restartable pipelines without an external
    workflow engine.
    """
    reg = (registry or BUILTINS).copy()
    if job.tasks:
        reg.discover(job.tasks)

    selected = _filter_commands(job, commands)

    if job.data and not dryrun:
        import os

        if not os.path.isdir(job.data):
            raise JobDataDirectoryNotFound(job.data)

    # fail-fast pre-validation (reference job.py:198-200)
    plan: list[tuple[Command, Any, Any, dict[str, EnvValue]]] = []
    for cmd in selected:
        spec, fn = reg.get(cmd.task)
        env = spec.apply_defaults(cmd.env)
        for warning in spec.validate_inputs(env):
            log.warning(warning)
        plan.append((cmd, spec, fn, env))

    results: list[StageResult] = []
    outputs: dict[str, DataFrame] = {}
    previous: DataFrame | None = None

    for cmd, spec, fn, env in plan:
        label = cmd.name or cmd.task
        if cmd.skip:
            log.info("Skipping command %s (skip=true)", label)
            results.append(StageResult(cmd, "skipped"))
            continue
        ctx = StageContext(
            spark=spark, job=job, command=cmd, env=env, outputs=outputs, previous=previous
        )
        if dryrun:
            log.info("DRYRUN %s task=%s env=%s", label, spec.name, env)
            results.append(StageResult(cmd, "dryrun"))
            continue
        wants_mat = str(env.get("MATERIALIZE", "")).lower() in ("true", "1")
        if resume and wants_mat and job.data:
            import os

            dest = os.path.join(job.data, "_stages", label)
            if os.path.isdir(dest):
                log.info("Resuming command %s from %s", label, dest)
                out = spark.read.parquet(dest)
                if cmd.name:
                    outputs[cmd.name] = out
                    out.createOrReplaceTempView(cmd.name)
                previous = out
                results.append(StageResult(cmd, "resumed", out))
                continue
        log.info("Running command %s (task=%s)", label, spec.name)
        try:
            out = fn(ctx)
            # per-stage materialization knob (reference parity: every
            # command materialized files; here it's opt-in — default
            # lazy so Catalyst fuses across stages, SURVEY.md §4.2)
            if out is not None and str(env.get("MATERIALIZE", "")).lower() in (
                "true",
                "1",
            ):
                import os

                if not job.data:
                    raise ValueError("MATERIALIZE=true requires a job data dir")
                dest = os.path.join(job.data, "_stages", label)
                out.write.mode("overwrite").parquet(dest)
                out = spark.read.parquet(dest)
        except TaskFailure:
            raise
        except Exception as exc:
            raise TaskFailure(cmd, exc) from exc
        if out is not None:
            if cmd.name:
                outputs[cmd.name] = out
                out.createOrReplaceTempView(cmd.name)
            previous = out
        results.append(StageResult(cmd, "success", out))
    return results


def run_task_tests(
    spark: SparkSession,
    registry: TaskRegistry | None = None,
    names: list[str] | None = None,
) -> dict[str, list[bool]]:
    """Execute every task's declared ``tests:`` block (reference
    task.py:161-193, task_test_case.py:8-26): run the task with the
    case's env, then evaluate ``verify_sql`` over the result (registered
    as view ``result``) — it must return a single row whose first column
    is true. Returns {task: [case passed...]}."""
    reg = registry or BUILTINS
    results: dict[str, list[bool]] = {}
    for name in names or reg.names():
        spec, fn = reg.get(name)
        if not spec.tests:
            continue
        outcomes = []
        for case in spec.tests:
            env = spec.apply_defaults(dict(case.env))
            dummy = Command(task=name, env=env)
            ctx = StageContext(
                spark=spark, job=Job(name="__tests__"), command=dummy, env=env
            )
            try:
                out = fn(ctx)
                if out is None:
                    outcomes.append(False)
                    continue
                out.createOrReplaceTempView("result")
                row = spark.sql(case.verify_sql).collect()
                outcomes.append(bool(row and row[0][0]))
            except Exception as exc:
                log.warning("task test for %s failed: %s", name, exc)
                outcomes.append(False)
        results[name] = outcomes
    return results


def explain_job(
    spark: SparkSession,
    job: Job,
    registry: TaskRegistry | None = None,
) -> str:
    """Dry-run as EXPLAIN: the fully-resolved manifest plus each
    stage's logical/physical plan without executing any action
    (reference dry-run parity, job.py:160-171 + task.py:312-317)."""
    reg = (registry or BUILTINS).copy()
    if job.tasks:
        reg.discover(job.tasks)
    lines = [f"job: {job.name}", f"data: {job.data}"]
    outputs: dict[str, DataFrame] = {}
    previous: DataFrame | None = None
    for cmd in job.commands:
        spec, fn = reg.get(cmd.task)
        env = spec.apply_defaults(cmd.env)
        lines.append(f"\ncommand: {cmd.name or cmd.task} (task={spec.name}, skip={cmd.skip})")
        for k, v in env.items():
            lines.append(f"  {k} = {v!r}")
        ctx = StageContext(
            spark=spark, job=job, command=cmd, env=env, outputs=outputs, previous=previous
        )
        try:
            out = fn(ctx)
        except Exception as exc:
            lines.append(f"  (plan unavailable: {exc})")
            continue
        if out is not None:
            lines.append("  " + out._jdf.queryExecution().simpleString().strip())
            if cmd.name:
                outputs[cmd.name] = out
            previous = out
    return "\n".join(lines)
