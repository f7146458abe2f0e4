"""Pipeline plans: the xETL-compatible orchestration surface, Spark-first.

Reference parity (SURVEY.md §2-A; reference files xetl/models/job.py,
command.py, task.py): YAML Job manifests with typed env interfaces,
host-env inheritance, placeholder resolution, fail-fast validation,
skip/filter/dry-run, nested jobs — but a *task* is a DataFrame
transform executed on a shared SparkSession instead of a subprocess,
and stage outputs are named DataFrames (lazy, fused by Catalyst)
instead of files on disk.
"""

from xetl_spark.plans.models import (  # noqa: F401
    Command,
    Job,
    JobDataDirectoryNotFound,
    ManifestError,
    TaskInput,
    TaskSpec,
    UnknownTaskError,
    ValidationError,
)
from xetl_spark.plans.resolve import resolve_placeholders  # noqa: F401
from xetl_spark.plans.registry import TaskRegistry, task  # noqa: F401
from xetl_spark.plans.runner import (  # noqa: F401
    StageContext,
    StageResult,
    TaskFailure,
    explain_job,
    run_job,
    run_report,
    run_task_tests,
    stage_dependencies,
    vacuum_run_history,
    write_run_report,
)
