"""Placeholder-resolution semantics.

Mirrors the reference's matrix (tests/models/test_job.py:316-467 for
substitution/type/escape cases, :857-934 tmp allocation, :965-1073
previous/named-command errors). No Spark needed — pure model layer.
"""

import os

import pytest

from xetl_spark.plans.models import Job, ManifestError


def make_job(commands, env=None, data=None, tmp_path=None):
    return Job(
        name="t",
        basedir=str(tmp_path) if tmp_path else None,
        data=data,
        env=env or {},
        commands=commands,
    )


def test_bare_var_from_own_env():
    job = make_job([{"task": "noop", "env": {"A": "x", "B": "$A"}}])
    assert job.commands[0].env["B"] == "x"


def test_braced_var_and_embedding():
    job = make_job([{"task": "noop", "env": {"A": "x", "B": "pre-${A}-post"}}])
    assert job.commands[0].env["B"] == "pre-x-post"


def test_whole_match_preserves_type():
    # reference job.py:383-385, test_job.py:371-400
    job = make_job([{"task": "noop", "env": {"N": 42, "F": 1.5, "B": True, "X": "${N}", "Y": "${F}", "Z": "${B}"}}])
    env = job.commands[0].env
    assert env["X"] == 42 and isinstance(env["X"], int)
    assert env["Y"] == 1.5 and isinstance(env["Y"], float)
    assert env["Z"] is True


def test_embedded_stringifies_and_none_renders_null():
    # reference job.py:387, test_job.py:448-467
    job = make_job([{"task": "noop", "env": {"N": 42, "V": None, "S": "n=${N} v=${V}"}}])
    assert job.commands[0].env["S"] == "n=42 v=null"


def test_dollar_escape():
    # reference job.py:372, test_job.py:403-445
    job = make_job([{"task": "noop", "env": {"A": "x", "S": "$$A", "T": "$$${A}", "U": "$$$$"}}])
    env = job.commands[0].env
    assert env["S"] == "$A"
    assert env["T"] == "$x"
    assert env["U"] == "$$"


def test_self_reference_left_unresolved():
    # reference job.py:355-370
    job = make_job([{"task": "noop", "env": {"A": "keep-$A"}}])
    assert job.commands[0].env["A"] == "keep-$A"


def test_unknown_bare_var_left_unresolved():
    job = make_job([{"task": "noop", "env": {"S": "$NOPE stays"}}])
    assert job.commands[0].env["S"] == "$NOPE stays"


def test_job_fields_and_env():
    job = make_job(
        [{"task": "noop", "env": {"D": "${job.data}", "E": "${job.env.K}"}}],
        env={"K": "v"},
        data="/tmp",
    )
    assert job.commands[0].env["D"] == "/tmp"
    assert job.commands[0].env["E"] == "v"


def test_previous_reference():
    job = make_job(
        [
            {"name": "one", "task": "noop", "env": {"OUT": "a"}},
            {"task": "noop", "env": {"IN": "${previous.env.OUT}"}},
        ]
    )
    assert job.commands[1].env["IN"] == "a"


def test_previous_on_first_command_raises():
    # reference job.py:326-328, test_job.py:965-981 (pydantic wraps
    # load-time analysis errors, same as the reference's pydantic v2)
    with pytest.raises(Exception, match="previous"):
        make_job([{"task": "noop", "env": {"X": "${previous.env.A}"}}])


def test_named_command_reference():
    job = make_job(
        [
            {"name": "build", "task": "noop", "env": {"OUT": "b"}},
            {"task": "noop", "env": {}},
            {"task": "noop", "env": {"IN": "${build.env.OUT}"}},
        ]
    )
    assert job.commands[2].env["IN"] == "b"


def test_forward_named_reference_raises():
    # reference job.py:337-339, test_job.py:984-1073 (acyclicity)
    with pytest.raises(Exception, match="earlier"):
        make_job(
            [
                {"task": "noop", "env": {"IN": "${later.env.OUT}"}},
                {"name": "later", "task": "noop", "env": {"OUT": "x"}},
            ]
        )


def test_fuzzy_name_matching():
    # reference utils/dicts.py:30-40: case-insensitive, '-' == '_'
    job = make_job(
        [
            {"name": "My-Stage", "task": "noop", "env": {"OUT": "z"}},
            {"task": "noop", "env": {"IN": "${my_stage.env.out}"}},
        ]
    )
    assert job.commands[1].env["IN"] == "z"


def test_tmp_dir_and_file_created_eagerly(tmp_path):
    # reference job.py:264-274: side effect at resolution time
    data = str(tmp_path)
    job = make_job(
        [{"task": "noop", "env": {"D": "${tmp.dir}", "F": "${tmp.file}"}}],
        data=data,
    )
    env = job.commands[0].env
    assert os.path.isdir(env["D"]) and env["D"].startswith(os.path.join(data, "tmp"))
    assert os.path.isfile(env["F"]) and env["F"].startswith(os.path.join(data, "tmp"))
    assert env["D"] != env["F"]


def test_transitive_resolution():
    job = make_job(
        [{"task": "noop", "env": {"A": "x", "B": "${A}/b", "C": "${B}/c"}}]
    )
    assert job.commands[0].env["C"] == "x/b/c"


def test_list_index_drilldown():
    job = make_job(
        [
            {"name": "first", "task": "noop", "env": {"OUT": "f"}},
            {"task": "noop", "env": {"X": "${job.commands[0].env.OUT}"}},
        ]
    )
    assert job.commands[1].env["X"] == "f"


def test_env_propagation_command_wins():
    # reference job.py:255-260, test_job.py:241-266
    job = make_job(
        [{"task": "noop", "env": {"K": "override"}}, {"task": "noop", "env": {}}],
        env={"K": "base", "L": "shared"},
    )
    assert job.commands[0].env["K"] == "override"
    assert job.commands[0].env["L"] == "shared"
    assert job.commands[1].env["K"] == "base"


def test_host_env_inheritance(monkeypatch):
    # reference job.py:121-130, 231-252
    monkeypatch.setenv("XETL_TEST_K", "from-host")
    job = Job(
        name="t",
        host_env=["XETL_TEST_K"],
        env={"XETL_TEST_K": "from-manifest"},
        commands=[{"task": "noop", "env": {"V": "${XETL_TEST_K}"}}],
    )
    assert job.commands[0].env["V"] == "from-host"


def test_env_keys_conformed_upper_snake():
    # reference utils/dicts.py:14-27, test_job.py:269-291
    job = make_job([{"task": "noop", "env": {"my-key": 1}}])
    assert "MY_KEY" in job.commands[0].env


def test_relative_data_requires_basedir():
    # reference job.py:220-228, test_job.py:505-608
    with pytest.raises(Exception, match="relative"):
        Job(name="t", data="rel/path", commands=[])


def test_relative_data_resolved_against_basedir(tmp_path):
    job = Job(name="t", basedir=str(tmp_path), data="d", commands=[])
    assert job.data == os.path.join(str(tmp_path), "d")


def test_host_env_star_inherits_everything(monkeypatch):
    # reference job.py:121-130: '*' allowlists the entire host env
    monkeypatch.setenv("XETL_STAR_VAR", "starred")
    job = Job(
        name="t",
        host_env="*",
        commands=[{"task": "noop", "env": {"V": "${XETL_STAR_VAR}"}}],
    )
    assert job.commands[0].env["V"] == "starred"


def test_host_env_not_allowlisted_ignored(monkeypatch):
    monkeypatch.setenv("XETL_SECRET", "leak")
    job = Job(
        name="t",
        host_env=["OTHER"],
        env={"XETL_SECRET": "manifest-wins"},
        commands=[{"task": "noop", "env": {"V": "${XETL_SECRET}"}}],
    )
    assert job.commands[0].env["V"] == "manifest-wins"
