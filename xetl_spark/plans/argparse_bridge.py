"""Env→argparse bridge (reference xetl/argparse.py:9-47 parity).

Builds ``--kebab-case`` CLI options from a TaskSpec's env interface;
at parse time, options omitted on the CLI are filled from os.environ
(env var name = UPPER_SNAKE); CLI wins over env (precedence pinned by
reference tests/test_argparser.py:244-277). Lets any task be driven
ad-hoc from a shell with the same typed interface the pipeline uses.
"""

from __future__ import annotations

import argparse
import os
from typing import Any

from xetl_spark.plans.models import TaskSpec, _TYPE_MAP


def _parse_bool(v: str) -> bool:
    return v.strip().lower() in ("1", "true", "yes", "on")


class ArgumentParser(argparse.ArgumentParser):
    def __init__(self, task: TaskSpec, **kwargs: Any):
        super().__init__(description=task.description or task.name, **kwargs)
        self._task = task
        for name, spec in task.env.items():
            flag = "--" + name.lower().replace("_", "-")
            t = _TYPE_MAP.get(spec.type or "string", str)
            self.add_argument(
                flag,
                dest=name,
                type=_parse_bool if t is bool else t,
                required=False,  # requiredness enforced after env fallback
                default=None,
                help=spec.description,
            )

    def parse_args(self, args=None, namespace=None):  # type: ignore[override]
        ns = super().parse_args(args, namespace)
        for name, spec in self._task.env.items():
            if getattr(ns, name, None) is None:
                if name in os.environ:
                    raw = os.environ[name]
                    t = _TYPE_MAP.get(spec.type or "string", str)
                    setattr(ns, name, _parse_bool(raw) if t is bool else t(raw))
                elif spec.default is not None:
                    setattr(ns, name, spec.default)
                elif spec.required:
                    self.error(f"missing required input {name} (flag or env var)")
        return ns
