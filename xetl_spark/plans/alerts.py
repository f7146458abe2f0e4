"""Run-report-driven alerting: declarative rules evaluated against the
structured run report after a job finishes.

The reference surfaces run outcomes only through log decorations
(xetl/logging.py); here the runner already emits a structured report
(plans/runner.py run_report), so alerting is a pure function of that
artifact — no instrumentation coupling, and rules can be tested
against canned reports.

Rule file (YAML, same config-first philosophy as job manifests):

    alerts:
      - name: stage-too-slow
        scope: stage              # evaluate once per stage
        when: wall_s > 60
      - name: any-failure
        scope: run                # evaluate once per run
        when: failed_stages > 0
        fail: true                # non-zero exit code when fired
      - name: suspicious-empty-output
        scope: stage
        when: rows == 0
        run: "notify-send xetl $ALERT_NAME"   # optional subprocess

Conditions are single comparisons ``<field> <op> <literal>`` — the
same deliberately-small surface as the reference's env placeholders:
enough for operational gates (too slow, failed, empty, retried),
no eval() of arbitrary code. Stage scope exposes the report's stage
fields (name, task, status, wall_s, attempts, rows, bytes); run scope
exposes job, total_wall_s, n_stages, failed_stages, skipped_stages,
rows_total. Fired alerts run their optional ``run:`` subprocess with
ALERT_NAME / ALERT_SCOPE / ALERT_STAGE / ALERT_VALUE in the
environment — the reference's subprocess escape hatch, applied to
notification.
"""

from __future__ import annotations

import json
import logging
import os
import re
import shlex
import subprocess
from dataclasses import dataclass, field
from typing import Any

log = logging.getLogger("xetl_spark.alerts")

_OPS = {
    ">": lambda a, b: a is not None and a > b,
    ">=": lambda a, b: a is not None and a >= b,
    "<": lambda a, b: a is not None and a < b,
    "<=": lambda a, b: a is not None and a <= b,
    "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
}

_COND = re.compile(
    r"^\s*([A-Za-z_][A-Za-z0-9_]*)\s*(>=|<=|==|!=|>|<)\s*(.+?)\s*$"
)


class AlertConfigError(ValueError):
    """Malformed alert rule (unknown op/scope, unparseable condition)."""


@dataclass
class AlertRule:
    name: str
    when: str
    scope: str = "stage"
    run: str | None = None
    fail: bool = False
    _parsed: tuple[str, str, Any] = field(init=False, repr=False)

    def __post_init__(self) -> None:
        if self.scope not in ("stage", "run"):
            raise AlertConfigError(
                f"alert {self.name!r}: scope must be 'stage' or 'run', got {self.scope!r}"
            )
        m = _COND.match(self.when)
        if not m:
            raise AlertConfigError(
                f"alert {self.name!r}: condition {self.when!r} is not "
                "'<field> <op> <literal>'"
            )
        fld, op, raw = m.groups()
        self._parsed = (fld, op, _literal(raw))

    def fires_on(self, values: dict[str, Any]) -> bool:
        fld, op, lit = self._parsed
        if fld not in values:
            raise AlertConfigError(
                f"alert {self.name!r}: unknown field {fld!r} for scope "
                f"{self.scope!r} (have: {', '.join(sorted(values))})"
            )
        return _OPS[op](values[fld], lit)


def _literal(raw: str) -> Any:
    raw = raw.strip()
    if len(raw) >= 2 and raw[0] == raw[-1] and raw[0] in "'\"":
        return raw[1:-1]
    low = raw.lower()
    if low in ("true", "false"):
        return low == "true"
    try:
        return int(raw)
    except ValueError:
        pass
    try:
        return float(raw)
    except ValueError:
        return raw  # bare word compares as string (e.g. status == failed)


def load_rules(path: str) -> list[AlertRule]:
    import yaml

    with open(path) as fh:
        doc = yaml.safe_load(fh) or {}
    entries = doc.get("alerts", doc if isinstance(doc, list) else [])
    if not isinstance(entries, list):
        raise AlertConfigError(f"{path}: expected a top-level 'alerts' list")
    rules = []
    for e in entries:
        if not isinstance(e, dict) or "name" not in e or "when" not in e:
            raise AlertConfigError(f"{path}: each alert needs 'name' and 'when': {e!r}")
        rules.append(
            AlertRule(
                name=str(e["name"]),
                when=str(e["when"]),
                scope=str(e.get("scope", "stage")),
                run=e.get("run"),
                fail=bool(e.get("fail", False)),
            )
        )
    return rules


def _run_values(report: dict[str, Any]) -> dict[str, Any]:
    stages = report.get("stages", [])
    return {
        "job": report.get("job"),
        "total_wall_s": report.get("total_wall_s"),
        "n_stages": len(stages),
        "failed_stages": sum(1 for s in stages if s.get("status") == "failed"),
        "skipped_stages": sum(1 for s in stages if s.get("status") == "skipped"),
        "rows_total": sum(s.get("rows") or 0 for s in stages),
    }


def evaluate_alerts(
    report: dict[str, Any], rules: list[AlertRule]
) -> list[dict[str, Any]]:
    """Evaluate every rule against the report; returns fired-alert
    records (name, scope, stage, value). Pure — no side effects."""
    fired: list[dict[str, Any]] = []
    run_vals = _run_values(report)
    for rule in rules:
        if rule.scope == "run":
            if rule.fires_on(run_vals):
                fired.append(
                    {
                        "name": rule.name,
                        "scope": "run",
                        "stage": None,
                        "value": run_vals.get(rule._parsed[0]),
                        "fail": rule.fail,
                        "run": rule.run,
                    }
                )
        else:
            for s in report.get("stages", []):
                if rule.fires_on({k: s.get(k) for k in (
                    "name", "task", "status", "wall_s", "attempts", "rows", "bytes"
                )}):
                    fired.append(
                        {
                            "name": rule.name,
                            "scope": "stage",
                            "stage": s.get("name"),
                            "value": s.get(rule._parsed[0]),
                            "fail": rule.fail,
                            "run": rule.run,
                        }
                    )
    return fired


def dispatch_alerts(fired: list[dict[str, Any]]) -> int:
    """Side-effect pass over fired alerts: log each one; run any
    ``run:`` subprocess with ALERT_* env. Returns the suggested exit
    code (3 if any fired rule is marked fail, else 0). Subprocess
    failures are logged, never raised — alerting must not mask the
    run's own outcome."""
    exit_code = 0
    for f in fired:
        log.warning(
            "ALERT %s (%s%s): value=%r",
            f["name"],
            f["scope"],
            f" stage={f['stage']}" if f["stage"] else "",
            f["value"],
        )
        if f.get("fail"):
            exit_code = 3
        cmd = f.get("run")
        if cmd:
            env = dict(
                os.environ,
                ALERT_NAME=str(f["name"]),
                ALERT_SCOPE=str(f["scope"]),
                ALERT_STAGE=str(f["stage"] or ""),
                ALERT_VALUE=json.dumps(f["value"]),
            )
            try:
                subprocess.run(shlex.split(cmd), env=env, check=True, timeout=60)
            except Exception as e:  # noqa: BLE001
                log.error("alert %s: hook %r failed: %s", f["name"], cmd, e)
    return exit_code
